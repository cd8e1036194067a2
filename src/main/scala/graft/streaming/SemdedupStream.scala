package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming SEMANTIC near-dup classification — the embedding twin of
  * [[NeardupStream]], completing the streaming side of the
  * incremental-classify trio (exact digests: IngestDedupStream;
  * lexical MinHash: NeardupStream; semantic: here). The corpus's
  * FROZEN hierarchical blocking ([[graft.dedup.Dedup.semanticBlocking]]
  * — coarse centroids + deduped quota reps, built ONCE per stream) is
  * the static side; each arriving micro-batch of vectors runs
  * [[graft.dedup.Dedup.semanticClassify]] through it inside
  * foreachBatch — count-free and retrain-free per trigger, cost
  * ∝ batch × blockSize.
  *
  * Row-for-row stream ≡ batch BY CONSTRUCTION: a batch vector's
  * classification is a pure function of (vector, frozen blocking,
  * corpus) — batch vectors never interact — so the union of
  * per-trigger outputs is the one-shot [[graft.dedup.Dedup.semanticIncremental]]
  * output whatever the trigger split (SemdedupStreamSpec pins it
  * across a forced multi-trigger run). The oracle is
  * q_semdedup_incremental's SQL verbatim.
  */
object SemdedupStream {

  /** Classify the streamed 10% slice of `dir`'s embeddings against
    * the frozen blocking of the 90% corpus. Returns the materialized
    * classification (vec_id, status, dup_of, cosine).
    */
  def classifyFile(spark: SparkSession, dir: String, threshold: Double,
      statePartitions: Int = 8,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val corpus = graft.Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 10 =!= 0)
      .select(col("vec_id"), col("embedding"))
    val blocking0 = graft.dedup.Dedup.semanticBlocking(
      corpus, "vec_id", "embedding", threshold)
    // the rep table is the frozen structure every trigger probes —
    // pin it for the stream's duration (≈ n/blockSize rows) so each
    // micro-batch pays a rep JOIN, not a rep re-derivation
    val blocking = blocking0.copy(reps = blocking0.reps.cache())
    val src = EventSource.streamTable(spark, dir, "embeddings", maxFilesPerTrigger)
      .filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding"))
    val scratch = java.nio.file.Files.createTempDirectory("graft_stream_semdedup")
      .toAbsolutePath.toString
    try {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
      try {
        val q = src.writeStream
          .option("checkpointLocation", s"$scratch/ckpt")
          .foreachBatch { (mb: DataFrame, _: Long) =>
            graft.dedup.Dedup
              .semanticClassify(blocking, corpus, mb, "vec_id", "embedding",
                threshold)
              .write.mode("append").parquet(s"$scratch/out")
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      spark.read.parquet(s"$scratch/out").localCheckpoint()
    } finally {
      blocking.reps.unpersist()
      graft.tools.Scratch.deleteRecursively(new java.io.File(scratch))
    }
  }
}
