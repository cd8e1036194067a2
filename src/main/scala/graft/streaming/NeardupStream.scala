package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming LEXICAL near-dup classification — the MinHash member of
  * the streaming ingest-dedup family (VERDICT r10 "what's missing"
  * #1). [[IngestDedupStream]] proved the stateless stream-static
  * shape for exact/token-set digests, where the whole classification
  * is two equi-joins; the MinHash classifier additionally needs a
  * per-document band explode, a candidate DISTINCT and a
  * lowest-match aggregation, so each arriving micro-batch runs the
  * full [[graft.dedup.MinHashIndex.classify]] against the SAVED index
  * inside `foreachBatch` — the corpus side is served from parquet
  * (the bucket layout the index persists), and per-micro-batch cost
  * is the batch's own bucket collisions, exactly the batch
  * classifier's economics applied per trigger.
  *
  * Row-for-row stream ≡ batch BY CONSTRUCTION, whatever the
  * micro-batch split: each document's classification depends only on
  * (document, frozen index) — never on other batch documents — so the
  * union of per-trigger outputs IS the one-shot batch output
  * (NeardupStreamSpec pins it across a forced multi-trigger run).
  * The oracle is q_neardup_incremental's SQL verbatim.
  *
  * No state store, no watermark: the aggregation inside foreachBatch
  * is a BATCH aggregation over one trigger's rows — nothing carries
  * across triggers, so the stream is unbounded-safe. In-stream
  * self-duplicates are the stateful q_stream_dedup stage; production
  * composes the two.
  */
object NeardupStream {

  /** Classify the streamed 10% batch slice of `dir`'s documents
    * against the MinHash index saved at `indexPath`. Returns the
    * materialized classification (doc_id, status, dup_of, jaccard) —
    * eagerly snapshotted, so the scratch sink is gone by return.
    */
  def classifyFile(spark: SparkSession, dir: String, indexPath: String,
      threshold: Double, statePartitions: Int = 8,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val idx = graft.dedup.MinHashIndex.load(spark, indexPath, "doc_id")
    val src = EventSource.streamTable(spark, dir, "documents", maxFilesPerTrigger)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text"))
    MicroBatchHarness.run(spark, src, "graft_stream_neardup",
      statePartitions) { mb =>
      graft.dedup.MinHashIndex.classify(idx, mb, "doc_id", "text", threshold)
    }
  }
}
