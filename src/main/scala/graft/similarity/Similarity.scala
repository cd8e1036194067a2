package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — one codegen'd pass over the
  * corpus, planned as TakeOrderedAndProject (per-partition heap of k,
  * then a k-row merge on the driver; no global sort, no collect of
  * the corpus). On a 1000-executor cluster this is the right exact
  * algorithm: the query vector is a broadcast literal and the scan is
  * embarrassingly parallel.
  *
  * Scale path: sign-bit LSH bucketing — probe only buckets within
  * Hamming distance `probeHamming` of the query's bucket, trading
  * recall for a corpus-fraction scan. Bucket ids are cheap determinist
  * functions of the vector, so the bucketed corpus can be written
  * bucket-partitioned and pruned at scan time.
  */
object Similarity {

  /** Cosine similarity of each row's `vecCol` against a literal query
    * vector, exact top-k (ties broken by id ascending).
    */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = typedlit(query)
    emb.select(col(idCol), VectorOps.cosine(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** LSH-bucketed approximate top-k: compare only vectors whose
    * sign-bit bucket is within `probeHamming` bit flips of the query
    * bucket. With signBits=b and probeHamming=1, scans ~(1+b)/2^b of
    * the corpus.
    */
  def bucketedTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, signBits: Int = 8,
      probeHamming: Int = 1): DataFrame = {
    val qBucket: Long = query.take(signBits)
      .foldLeft(0L)((acc, x) => acc * 2 + (if (x >= 0f) 1L else 0L))
    val probes: Seq[Long] =
      if (probeHamming <= 0) Seq(qBucket)
      else qBucket +: (0 until signBits).map(i => qBucket ^ (1L << i))
    val q = typedlit(query)
    emb.select(col(idCol), col(vecCol),
      VectorOps.signBucket(col(vecCol), signBits).as("bucket"))
      .filter(col("bucket").isin(probes: _*))
      .select(col(idCol), VectorOps.cosine(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** All-pairs exact cosine for a (small, broadcastable) query set
    * against the corpus: query rows are broadcast, corpus streams.
    */
  def batchTopK(emb: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = emb.crossJoin(broadcast(
      queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"))))
      .select(col("query_id"), col(idCol),
        VectorOps.cosine(col(vecCol), col("qv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idCol))
    joined.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }
}
