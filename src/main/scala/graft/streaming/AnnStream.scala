package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming ANN serving — the similarity-family member of the
  * streaming ingest/serve battery ([[IngestDedupStream]] exact,
  * [[NeardupStream]] lexical, [[SemdedupStream]] semantic; this one
  * answers RETRIEVAL, not dedup). Query vectors arrive as a real file
  * stream and each micro-batch probes the SAVED
  * [[graft.similarity.IvfIndex]] inside `foreachBatch` via the
  * batched [[graft.similarity.IvfIndex.probeJoin]] — the corpus side
  * is served from the cell-partitioned parquet layout (non-probed
  * cells pruned at the scan), and per-trigger cost is the trigger's
  * queries × their probed cells, exactly the per-query serving
  * economics applied per micro-batch.
  *
  * Row-for-row stream ≡ batch BY CONSTRUCTION, whatever the
  * micro-batch split: each query's top-k depends only on
  * (query vector, frozen index) — never on other in-flight queries —
  * so the union of per-trigger outputs IS the one-shot batched probe
  * (AnnStreamSpec pins it across a forced multi-trigger run).
  * Tombstoned corpus ids are filtered by `IvfIndex.load`, so a
  * takedown is invisible to the stream the moment the sidecar row
  * lands.
  *
  * No state store, no watermark: the per-trigger top-k is a BATCH
  * aggregation over one trigger's queries — nothing carries across
  * triggers, so the stream is unbounded-safe.
  */
object AnnStream {

  /** Probe the streamed 5% query slice (vec_id % 20 == 0) of `dir`'s
    * embeddings against the IVF index saved at `indexPath`. Returns
    * the materialized (query_id, rk, vec_id, cosine) answers —
    * eagerly snapshotted, so the scratch sink is gone by return.
    */
  def probeFile(spark: SparkSession, dir: String, indexPath: String,
      k: Int, nProbe: Int, statePartitions: Int = 8,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val idx = graft.similarity.IvfIndex.load(spark, indexPath,
      "vec_id", "embedding")
    val src = EventSource.streamTable(spark, dir, "embeddings", maxFilesPerTrigger)
      .filter(col("vec_id") % 20 === 0)
      .select(col("vec_id"), col("embedding"))
    val scratch = java.nio.file.Files.createTempDirectory("graft_stream_ann")
      .toAbsolutePath.toString
    try {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
      try {
        val q = src.writeStream
          .option("checkpointLocation", s"$scratch/ckpt")
          .foreachBatch { (mb: DataFrame, _: Long) =>
            graft.similarity.IvfIndex
              .probeJoin(idx, mb, "vec_id", "embedding", k, nProbe)
              .write.mode("append").parquet(s"$scratch/out")
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      // eager: the scratch sink is deleted on exit, so the returned
      // rows must not reference it (the q_compact lifetime pattern)
      spark.read.parquet(s"$scratch/out").localCheckpoint()
    } finally graft.tools.Scratch.deleteRecursively(new java.io.File(scratch))
  }
}
