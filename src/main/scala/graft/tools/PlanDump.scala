package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main: print (or dump to files) the formatted plan of the
  * named queries, BENCH path (overrides included — the timed bodies).
  *
  * `runMain graft.tools.PlanDump <sfDir> [--out <dir> [--suffix <s>]] q_a q_b ...`
  *
  * With `--out`, each query's `.explain("formatted")` output is written
  * to `<dir>/<query><suffix>.txt` (the plans/r17 deliverable). Queries
  * whose timed body ends in an eager localCheckpoint would explain as a
  * bare "Scan ExistingRDD" — for those the WARM body runs first so the
  * dump reflects steady state, and the formatted plan of the returned
  * frame is still what the contract asks for.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    var rest = args.tail.toSeq
    var out: Option[String] = None
    var suffix = ""
    while (rest.headOption.exists(_.startsWith("--"))) rest match {
      case "--out" +: dir +: tl => out = Some(dir); rest = tl
      case "--suffix" +: s +: tl => suffix = s; rest = tl
      case _ => throw new IllegalArgumentException(rest.head)
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val benchMap = graft.SparkEntry.benchQueries
    rest.foreach { q =>
      // bench-override queries amortize a per-dir build on first call;
      // run once so the dumped plan is the steady-state serve plan
      try benchMap(q)(spark, sfDir).count() catch { case _: Throwable => () }
      graft.Bench.scrub(spark)
      val df = benchMap(q)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      out match {
        case Some(dir) =>
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/$q$suffix.txt"),
            txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          println(s"[plandump] wrote $dir/$q$suffix.txt")
        case None =>
          println(s"===== $q =====")
          println(txt.take(4000))
      }
      graft.Bench.scrub(spark)
    }
    spark.stop()
  }
}
