package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming ingest dedup — the streaming twin of
  * q_dedup_incremental: documents arrive as a file stream and each is
  * classified against the STATIC corpus index (built once from the
  * existing 90%) as exact duplicate / near duplicate / new, with the
  * matched corpus doc. The production shape for "check every incoming
  * crawl batch against the corpus before it lands".
  *
  * Stateless by construction: a stream-static equi-join needs no
  * state store at all (the static side is re-planned per micro-batch,
  * broadcast or shuffled as its size dictates), so rows classify and
  * emit immediately — no watermark, no eviction, unbounded-stream
  * safe. In-stream self-duplicates are the STATEFUL variant
  * (dropDuplicates — q_stream_dedup's shape) and deliberately out of
  * scope here; production composes the two stages.
  *
  * Deterministic: same input → same rows; the batch-equivalence
  * oracle is EXACTLY q_dedup_incremental's SQL.
  */
object IngestDedupStream {

  // ONE definition of both digest keys (graft.dedup.Dedup) — this
  // stream shares q_dedup_incremental's oracle verbatim, so the two
  // engine-side computations must be the same code, not two copies
  private def exactKey = graft.dedup.Dedup.exactTextKey(col("text"))
  private def nearKey = graft.dedup.Dedup.tokenSetKey(col("text"))

  def classifyFile(spark: SparkSession, dir: String,
      statePartitions: Int = 8): DataFrame = {
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 10 =!= 0)
    val exactIdx = corpus.groupBy(exactKey.as("ek"))
      .agg(min(col("doc_id")).as("exact_of"))
    val nearIdx = corpus.groupBy(nearKey.as("nk"))
      .agg(min(col("doc_id")).as("near_of"))
    val src = EventSource.streamTable(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), exactKey.as("ek"), nearKey.as("nk"))
      .join(exactIdx, Seq("ek"), "left")
      .join(nearIdx, Seq("nk"), "left")
      .select(col("doc_id"),
        when(col("exact_of").isNotNull, lit("exact_dup"))
          .when(col("near_of").isNotNull, lit("near_dup"))
          .otherwise(lit("new")).as("status"),
        coalesce(col("exact_of"), col("near_of")).as("dup_of"))
    val name = s"stream_ingest_${System.nanoTime()}"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    try {
      val q = src.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    spark.table(name).orderBy("doc_id")
  }
}
