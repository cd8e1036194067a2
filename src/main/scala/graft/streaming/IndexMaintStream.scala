package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING INDEX MAINTENANCE (VERDICT r12 next-round #3) — the
  * production ingest loop for a live ANN serving index, composed from
  * parts that each existed but were never exercised as one operator:
  * new vectors arrive as a real file stream, and every micro-batch
  * Δ-appends into the saved [[graft.similarity.IvfIndex]] at the
  * FROZEN centroid layout, publishing ONE committed generation per
  * trigger ([[graft.similarity.IvfIndex.appendPublish]]) — while
  * concurrent probes keep serving the last committed generation. A
  * reader can never observe a torn layout or a partial Δ: the frozen
  * corpus dirs pass between generations by manifest reference, the
  * trigger's new dir becomes visible only with the commit marker, and
  * centroids never move (IndexMaintStreamSpec loads the index from
  * inside the stream and asserts every observation is a complete
  * committed prefix).
  *
  * Because [[graft.similarity.IvfIndex.encode]]-style assignment is a
  * pure function of (vector, frozen centroids), the trigger split is
  * invisible: stream-appending a corpus ≡ one batch append of the
  * union ≡ a re-assignment of corpus ∪ Δ at the same centroids — the
  * existing append≡rebuild contracts COMPOSE (spec-pinned). Retrain
  * stays a cadence decision driven by
  * [[graft.similarity.IvfIndex.skewRatio]], exactly as in batch
  * maintenance.
  */
object IndexMaintStream {

  /** Drain `dir`'s `table` into the index at `indexPath`, one
    * generation publish per micro-batch. `onTrigger` runs once per
    * micro-batch BEFORE its append with the batch rows — the
    * concurrent-reader seam the spec probes through (a production
    * caller leaves the default). Returns the trigger count.
    */
  def appendFile(spark: SparkSession, dir: String, indexPath: String,
      idCol: String = "vec_id", vecCol: String = "embedding",
      table: String = "embeddings", shufflePartitions: Int = 8,
      maxFilesPerTrigger: Option[Int] = None,
      onTrigger: DataFrame => Unit = _ => ()): Long = {
    val src = EventSource.streamTable(spark, dir, table, maxFilesPerTrigger)
      .select(col(idCol), col(vecCol))
    val scratch = java.nio.file.Files.createTempDirectory("graft_idx_maint")
      .toAbsolutePath.toString
    var triggers = 0L
    try {
      ConfScope.withConf(spark, "spark.sql.shuffle.partitions",
        shufflePartitions.toString) {
        val q = src.writeStream
          .option("checkpointLocation", s"$scratch/ckpt")
          .foreachBatch { (mb: DataFrame, _: Long) =>
            onTrigger(mb)
            graft.similarity.IvfIndex.appendPublish(
              spark, indexPath, mb, idCol, vecCol)
            triggers += 1
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      triggers
    } finally graft.tools.Scratch.deleteRecursively(new java.io.File(scratch))
  }
}
