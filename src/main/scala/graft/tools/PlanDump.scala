package graft.tools

/** Dump `.explain("formatted")` for named queries to files — the
  * optimization-round evidence trail (`plans/rNN/<query>_{before,after}.txt`).
  *
  * Usage: sbt "runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [q91,q92]"
  * With no query list, dumps every declared query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.ERROR)
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "plans/r18"
    val suffix = if (args.length > 2) args(2) else "before"
    val only = if (args.length > 3)
      Some(args(3).split(",").map(_.trim).filter(_.nonEmpty).toSet)
    else None
    val spark = graft.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = new java.io.File(outDir)
    dir.mkdirs()
    val selected = graft.SparkEntry.queries.toSeq.sortBy(_._1).filter {
      case (n, _) => only.forall(_.exists(p => n == p || n.startsWith(p + "_")))
    }
    selected.foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val f = new java.io.File(dir, s"${name}_$suffix.txt")
        val w = new java.io.PrintWriter(f)
        try w.println(plan) finally w.close()
        println(s"wrote $f")
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(s"FAILED $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
