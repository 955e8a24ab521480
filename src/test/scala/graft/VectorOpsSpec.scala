package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorAvg
import graft.operators.{Multimodal, Similarity}

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("VectorAvg aggregates element-wise means (typed path)") {
    val ds = Seq(
      ("a", Array(1.0, 2.0)), ("a", Array(3.0, 4.0)), ("b", Array(10.0, 0.0))
    ).toDS()
    val got = ds.groupByKey(_._1).mapValues(_._2)
      .agg(VectorAvg.toColumn.name("c"))
      .collect().toMap
    assert(got("a").toSeq == Seq(2.0, 3.0))
    assert(got("b").toSeq == Seq(10.0, 0.0))
  }

  test("kmeansStep computes exact decimal centroids per cell") {
    val vecs = Seq(
      (0L, Seq(1.0, 1.0)), (1L, Seq(1.0, 3.0)),   // near centroid 0
      (2L, Seq(-1.0, -1.0)), (3L, Seq(-3.0, -1.0)) // near centroid 2
    ).toDF("id", "v")
    val cent = vecs.filter(col("id") % 2 === 0)
    val got = Similarity.gatherCentroids(Similarity.kmeansStep(vecs, cent))
      .as[(Long, Seq[Double])].collect().toMap
    assert(got(0L) == Seq(1.0, 2.0))
    assert(got(2L) == Seq(-2.0, -1.0))
  }

  test("sampleFrames takes every stride-th fixed-size slice") {
    val bytes = (0 until 100).map(_.toByte).toArray
    val frames = Multimodal.sampleFrames(bytes, frameSize = 10, stride = 3)
    assert(frames.length == 4)            // slices 0,3,6,9 of 10 total
    assert(frames.head.toSeq == (0 until 10).map(_.toByte))
    assert(frames(1).toSeq == (30 until 40).map(_.toByte))
    assert(frames.last.toSeq == (90 until 100).map(_.toByte))
  }
}
