package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main: print the executed plan of the named queries.
  * `runMain graft.tools.PlanDump <sfDir> q_a q_b ...`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { q =>
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
