package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared micro-batch classify harness for the stateless
  * stream-static serving family ([[IngestDedupStream]] is stateful
  * and keeps its own loop; [[NeardupStream]], [[SemdedupStream]] and
  * [[AnnStream]] all run THIS shape): drive a bounded file stream to
  * completion, apply `perBatch` to each micro-batch inside
  * foreachBatch, append results to a scratch parquet sink, and return
  * the eagerly materialized union (localCheckpoint — the scratch is
  * deleted before return, the q_compact lifetime pattern).
  *
  * `shufflePartitions` bounds the per-trigger shuffle width, scoped
  * via [[ConfScope.withConf]] so the override can't leak into batch
  * queries on the same session (micro-batches are small; the session
  * default would fan tiny triggers across every core).
  *
  * Contract on `perBatch`: results must be pure functions of
  * (row, frozen serving artifact) — no state store, no watermark,
  * nothing carries across triggers. That purity is what makes the
  * trigger split invisible and the returned union the one-shot batch
  * answer (each caller's spec pins stream ≡ batch).
  */
private[streaming] object MicroBatchHarness {

  def run(spark: SparkSession, src: DataFrame, prefix: String,
      shufflePartitions: Int)(perBatch: DataFrame => DataFrame): DataFrame = {
    val scratch = java.nio.file.Files.createTempDirectory(prefix)
      .toAbsolutePath.toString
    try {
      ConfScope.withConf(spark, "spark.sql.shuffle.partitions",
        shufflePartitions.toString) {
        val q = src.writeStream
          .option("checkpointLocation", s"$scratch/ckpt")
          .foreachBatch { (mb: DataFrame, _: Long) =>
            perBatch(mb).write.mode("append").parquet(s"$scratch/out")
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      // zero triggers (empty source dir / nothing matches the glob)
      // means foreachBatch never ran and no sink exists — the answer
      // is perBatch over an empty batch of src's schema, not a
      // PATH_NOT_FOUND (ADVICE r11)
      if (!graft.tools.Artifacts.exists(spark, s"$scratch/out"))
        perBatch(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], src.schema))
          .localCheckpoint()
      else
        // eager: the scratch sink is deleted on exit, so the returned
        // rows must not reference it
        spark.read.parquet(s"$scratch/out").localCheckpoint()
    } finally graft.tools.Scratch.deleteRecursively(new java.io.File(scratch))
  }
}
