package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Epoch-idempotent foreachBatch sink.
  *
  * `foreachBatch` + blind append is AT-LEAST-ONCE: after a failure
  * between the sink write and the checkpoint commit, the restarted
  * query REPLAYS the epoch and the rows land twice. Spark's own
  * exactly-once sinks fix this by making the write transactional per
  * epoch; the same guarantee falls out of directory layout alone:
  * every epoch writes to its own `epoch=<id>` directory in OVERWRITE
  * mode, so a replay rewrites the same directory instead of
  * duplicating into a shared one. Readers see per-epoch atomicity
  * via parquet's _SUCCESS-guarded directory swap.
  *
  * This is the classic warehouse idempotent-upsert-by-partition
  * pattern (reference O13's per-topic file rewrite is its tiny
  * single-process ancestor — file_output_manager.py:56-60 rewrites
  * the whole file per batch for the same replayability reason).
  */
object IdempotentSink {

  /** foreachBatch body: exactly-once-effective parquet write.
    * Usage: `.foreachBatch(IdempotentSink.writeEpoch(_, _, root))`.
    */
  def writeEpoch(batch: DataFrame, epochId: Long, root: String): Unit =
    batch.write.mode("overwrite").parquet(s"$root/epoch=$epochId")

  /** All epochs written so far, with the `epoch` id as a column
    * (standard partition discovery over the layout).
    */
  def readAll(spark: SparkSession, root: String): DataFrame =
    spark.read.option("basePath", root).parquet(root)
}
