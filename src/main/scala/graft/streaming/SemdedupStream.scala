package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming SEMANTIC near-dup classification — the embedding twin of
  * [[NeardupStream]], completing the streaming side of the
  * incremental-classify trio (exact digests: IngestDedupStream;
  * lexical MinHash: NeardupStream; semantic: here). The corpus side is
  * the SAVED [[graft.dedup.SemanticIndex]] — frozen centroids + quota
  * reps + the pre-blocked corpus — so each arriving micro-batch runs
  * [[graft.dedup.SemanticIndex.classify]] inside foreachBatch:
  * count-free, retrain-free and corpus-rescan-free per trigger, cost
  * ∝ batch × blockSize (the pre-blocked candidate table is a parquet
  * scan, pinned in memory for the stream's duration below).
  *
  * Row-for-row stream ≡ batch BY CONSTRUCTION: a batch vector's
  * classification is a pure function of (vector, saved index) — batch
  * vectors never interact — so the union of per-trigger outputs is
  * the one-shot [[graft.dedup.Dedup.semanticIncremental]] output
  * whatever the trigger split (SemdedupStreamSpec pins it across a
  * forced multi-trigger run). The oracle is q_semdedup_incremental's
  * SQL verbatim.
  */
object SemdedupStream {

  /** Classify the streamed 10% slice of `dir`'s embeddings against
    * the SemanticIndex saved at `indexPath` (τ is the artifact's).
    * Returns the materialized classification (vec_id, status, dup_of,
    * cosine).
    */
  def classifyFile(spark: SparkSession, dir: String, indexPath: String,
      statePartitions: Int = 8,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val idx0 = graft.dedup.SemanticIndex.load(spark, indexPath,
      "vec_id", "embedding")
    // both frozen sides are probed by EVERY trigger — pin them for
    // the stream's duration (reps ≈ n/blockSize rows, corpus table
    // n rows) so each micro-batch pays joins, not parquet re-reads;
    // at corpus scale drop the corpus cache and let the (block, sb)
    // join broadcast the micro-batch side instead
    val idx = idx0.copy(
      blocking = idx0.blocking.copy(reps = idx0.blocking.reps.cache()),
      corpusBlocked = idx0.corpusBlocked.cache())
    val src = EventSource.streamTable(spark, dir, "embeddings", maxFilesPerTrigger)
      .filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding"))
    try
      MicroBatchHarness.run(spark, src, "graft_stream_semdedup",
        statePartitions)(mb => graft.dedup.SemanticIndex.classify(idx, mb))
    finally {
      idx.blocking.reps.unpersist()
      idx.corpusBlocked.unpersist()
    }
  }
}
