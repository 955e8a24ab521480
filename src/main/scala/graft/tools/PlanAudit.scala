package graft.tools

import org.apache.spark.sql.SparkSession

/** Physical-plan audit over the whole probe corpus: one row per query with
  * the scale-relevant plan markers counted — exchanges (total and
  * SinglePartition), broadcast vs sort-merge vs nested-loop joins,
  * cartesian products, whole-stage-codegen spans, and whether the scans
  * carry pushed filters. PlanContractSpec pins the critical properties as
  * tests; this tool gives the FULL-corpus view (the `.explain` sweep the
  * 100 TB design argument rests on) as one artifact: `target/plans.txt`.
  *
  * Plans are built and physical-planned but NOT executed (no AQE
  * finalization — the static plan is the pre-runtime contract; the Scale
  * tool audits final adaptive plans for the operators it times).
  *
  * Usage: sbt "runMain graft.tools.PlanAudit [sfDir]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.ERROR)
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")

    def count(p: String, needle: String): Int = needle.r.findAllIn(p).size

    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        // NOTE: no WholeStageCodegen column — pre-execution AQE plan
        // strings show the initial plan, where codegen wrapping has not
        // been applied yet (the Scale tool sees final adaptive plans)
        // shuffle exchanges only: a bare "Exchange " would also match
        // inside BroadcastExchange / ReusedExchange and inflate the count
        val ex = count(p,
          "Exchange (hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)")
        val sp = count(p, "Exchange SinglePartition")
        val bhj = count(p, "BroadcastHashJoin")
        val smj = count(p, "SortMergeJoin")
        val bnl = count(p, "BroadcastNestedLoopJoin")
        val cart = count(p, "CartesianProduct")
        val pushed = count(p, "PushedFilters: \\[[^\\]]") // non-empty lists
        (name, (ex, sp, bhj, smj, bnl, cart, pushed))
      } catch {
        case scala.util.control.NonFatal(e) =>
          (name, (-1, -1, -1, -1, -1, -1, -1))
      }
    }

    val header =
      "query                          ex  1part bhj  smj  bnlj  cart  pushed"
    val lines = header +: rows.map { case (n, (ex, sp, bhj, smj, bnl, cart, pu)) =>
      f"$n%-28s $ex%3d $sp%4d $bhj%4d $smj%4d $bnl%4d $cart%5d $pu%7d"
    }
    lines.foreach(println)

    // corpus-level flags, loud and greppable: cartesians are a hard red
    // flag (expect NONE); single-partition exchanges and BNLJs must each
    // be a known, documented site (scalar broadcasts / tiny centroid
    // crosses / the guarded brute-force baseline)
    def naming(f: ((String, (Int, Int, Int, Int, Int, Int, Int))) => Int) =
      rows.filter(r => f(r) > 0).map(_._1).mkString(",")
    println(s"AUDIT cartesian: ${naming(_._2._6)}")
    println(s"AUDIT single-partition: ${naming(_._2._2)}")
    println(s"AUDIT bnlj: ${naming(_._2._5)}")

    val out = new java.io.File("target/plans.txt")
    out.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(out)
    try lines.foreach(w.println) finally w.close()
    spark.stop()
  }
}
