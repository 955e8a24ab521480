package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class CosineSimSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)),
    (2L, Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0)),
    (3L, Seq(0.3, -0.7, 0.2), Seq(-0.1, 0.9, 0.4))
  ).toDF("id", "a", "b")

  test("native CosineSim is bit-identical to the HOF composition") {
    val got = vecs.select(col("id"),
        Similarity.cosine("a", "b").as("nat"),
        Similarity.cosineHof("a", "b").as("hof"))
      .as[(Long, Double, Double)].collect()
    got.foreach { case (_, nat, hof) =>
      assert(java.lang.Double.doubleToLongBits(nat) ==
        java.lang.Double.doubleToLongBits(hof))
    }
    assert(math.abs(got.find(_._1 == 1L).get._2 - 1.0) < 1e-12)
    assert(got.find(_._1 == 2L).get._2 == 0.0)
  }

  test("cosine_sim is registered as a SQL function via GraftExtensions") {
    val got = vecs.selectExpr("id", "cosine_sim(a, b) AS c")
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - 1.0) < 1e-12)
  }

  test("CosineSim rejects non-double-array inputs at analysis") {
    val bad = Seq((1L, Seq("x"), Seq(1.0))).toDF("id", "a", "b")
    intercept[Exception] {
      bad.select(Similarity.cosine("a", "b")).collect()
    }
  }

  test("RewriteHofCosine: optimizer rewrites the HOF composition to CosineSim") {
    // non-foldable source (literal local data would constant-fold away)
    val df = spark.range(3).selectExpr(
      "array(cast(id AS double), 1.0) AS a",
      "array(1.0, cast(id AS double)) AS b")
    val hof = df.select(Similarity.cosineHof("a", "b").as("c"))
    val optimized = hof.queryExecution.optimizedPlan
    val found = optimized.expressions.exists(_.exists {
      case _: graft.functions.CosineSim => true
      case _ => false
    })
    assert(found, s"expected CosineSim in optimized plan:\n$optimized")
    // and the rewritten query equals the un-rewritten computation
    val got = hof.as[Double].collect()
    val ref = (0 until 3).map { i =>
      val a = Seq(i.toDouble, 1.0); val b = Seq(1.0, i.toDouble)
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    got.zip(ref).foreach { case (g, r) => assert(math.abs(g - r) < 1e-12) }
  }

  test("CosineSim propagates null ELEMENTS like the HOF form") {
    val df = Seq((Seq(Option(1.0), None), Seq(Option(1.0), Option(2.0))))
      .toDF("a", "b")
    val both = df.select(Similarity.cosine("a", "b").as("nat"),
      Similarity.cosineHof("a", "b").as("hof")).collect().head
    assert(both.isNullAt(0) && both.isNullAt(1))
  }

  test("CosineSim returns null on length mismatch, like zip_with null-padding") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    val both = df.select(Similarity.cosine("a", "b").as("nat"),
      Similarity.cosineHof("a", "b").as("hof")).collect().head
    assert(both.isNullAt(0) && both.isNullAt(1))
  }

  test("CosineSim is null-safe") {
    val withNull = Seq((1L, Option(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("id", "a", "b")
    val got = withNull.select(Similarity.cosine("a", "b").as("c"))
      .collect().head
    assert(got.isNullAt(0))
  }
}
