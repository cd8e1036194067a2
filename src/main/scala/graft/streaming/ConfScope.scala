package graft.streaming

import org.apache.spark.sql.SparkSession

/** Scoped session-conf override: set, run, restore. The streaming
  * entry points need `spark.sql.legacy.parquet.nanosAsLong` while
  * their file-stream source reads the nanosecond-typed events parquet,
  * but a bare `conf.set` leaks a session-wide READ-BEHAVIOR change
  * into every batch query run afterwards on the same session — the
  * same hygiene the shuffle-partitions handling already applies.
  */
private[graft] object ConfScope {

  def withConf[T](spark: SparkSession, key: String, value: String)(body: => T): T = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** The events-parquet nano-timestamp read mode, scoped. */
  def nanosAsLong[T](spark: SparkSession)(body: => T): T =
    withConf(spark, "spark.sql.legacy.parquet.nanosAsLong", "true")(body)
}
