package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-once / classify-many MinHash+LSH index — the durable-artifact
  * half of [[Dedup.minhashIncremental]], completing the serving trio
  * with [[graft.similarity.IvfIndex]] (vectors) and
  * [[graft.similarity.PqIndex]] (compressed vectors): the corpus side
  * of lexical near-dup classification persisted once and probed by
  * every subsequent ingest batch.
  *
  * Layout: `buckets/` — (band_idx, band_hash, id), the LSH bucket
  * membership each probe joins against; `shingles/` — (id, sh), the
  * distinct k-shingle set per doc that exact-Jaccard verification
  * reads for CANDIDATES ONLY (the bucket join bounds how much of it
  * any batch touches); `params/` — one row pinning (shingle_k, bands,
  * rows_per_band), read back by [[load]]/[[append]] so a probe can
  * never silently band differently than the index it probes. All
  * band/minhash functions are seed-fixed and corpus-independent, so
  * an appended or freshly-probed side always agrees with the saved
  * one — "frozen" here is structural, not a training choice (unlike
  * IVF centroids, there is nothing to drift; appends never degrade
  * recall).
  *
  * At 100 TB: buckets and shingles are corpus-sized but written once;
  * a daily batch pays one bucket hash-join (shuffle keyed on
  * band_hash — uniform by construction) plus shingle reads bounded by
  * its candidate count. Appends write only Δ's rows (file-append, no
  * rewrite), the `refreshStats`/`IvfIndex.append` economics applied
  * to the lexical index.
  */
object MinHashIndex {

  /** `buckets`: (band_idx, band_hash, idCol); `shingles`: (idCol, sh).
    * Both may be lazy plans (fresh [[build]]) or parquet scans
    * ([[load]]).
    */
  final case class Index(buckets: DataFrame, shingles: DataFrame,
      idCol: String, shingleK: Int, bands: Int, rowsPerBand: Int)

  /** Compute the index sides for a corpus — two narrow projections of
    * one text scan (band keys via the native signature kernel,
    * distinct shingle sets). Docs with < k tokens carry no signature
    * and no shingles; they are excluded from both sides (they can
    * never be a near-dup match).
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, bands: Int = 4, rowsPerBand: Int = 4): Index = {
    val buckets = Dedup.minhashBandKeys(docs, idCol, textCol,
      shingleK, bands, rowsPerBand)
      .select(col("band_idx"), col("band_hash"), col(idCol))
    // shingles yields an EMPTY array (not null) below k tokens —
    // filter both forms, matching the signature kernel's null-drop
    val shingles = docs.select(col(idCol),
      graft.functions.HashExprs.shingles(col(textCol), shingleK).as("sh"))
      .filter(col("sh").isNotNull && size(col("sh")) > 0)
    Index(buckets, shingles, idCol, shingleK, bands, rowsPerBand)
  }

  def save(index: Index, path: String): Unit = {
    index.buckets.write.mode("overwrite").parquet(s"$path/buckets")
    index.shingles.write.mode("overwrite").parquet(s"$path/shingles")
    val spark = index.buckets.sparkSession
    import spark.implicits._
    Seq((index.shingleK, index.bands, index.rowsPerBand))
      .toDF("shingle_k", "bands", "rows_per_band")
      .repartition(1).write.mode("overwrite").parquet(s"$path/params")
  }

  def load(spark: SparkSession, path: String, idCol: String): Index = {
    // by NAME, not position: a column reorder in save must fail loudly
    // here, never silently swap shingle_k/bands and band differently
    // than the saved index (ADVICE r10)
    val p = spark.read.parquet(s"$path/params").collect()(0)
    Index(spark.read.parquet(s"$path/buckets"),
      spark.read.parquet(s"$path/shingles"),
      idCol, p.getAs[Int]("shingle_k"), p.getAs[Int]("bands"),
      p.getAs[Int]("rows_per_band"))
  }

  /** Incremental maintenance: band + shingle ONLY the new docs under
    * the saved params and append their rows — cost ∝ |newDocs|, no
    * corpus re-read, no rewrite of existing files (spec-asserted).
    * Because the hash family is corpus-independent, an appended index
    * classifies EXACTLY like a rebuild over corpus ∪ Δ — there is no
    * IVF-style drift to monitor.
    */
  def append(spark: SparkSession, path: String, newDocs: DataFrame,
      idCol: String, textCol: String): Unit = {
    val p = spark.read.parquet(s"$path/params").collect()(0)
    val delta = build(newDocs, idCol, textCol,
      p.getAs[Int]("shingle_k"), p.getAs[Int]("bands"),
      p.getAs[Int]("rows_per_band"))
    delta.buckets.write.mode("append").parquet(s"$path/buckets")
    delta.shingles.write.mode("append").parquet(s"$path/shingles")
  }

  /** Classify a batch against the indexed corpus — identical
    * semantics to [[Dedup.minhashIncremental]] with the corpus side
    * served from the saved layout (Dedup.classifyAgainst is the one
    * shared tail; MinHashIndexSpec pins the equality).
    */
  def classify(index: Index, batch: DataFrame, idCol: String,
      textCol: String, threshold: Double): DataFrame =
    Dedup.classifyAgainst(batch, idCol, textCol, threshold,
      index.shingleK, index.bands, index.rowsPerBand,
      index.buckets.select(col("band_idx"), col("band_hash"),
        col(index.idCol).as("cid")),
      index.shingles.select(col(index.idCol).as("cid"),
        col("sh").as("sh_c")))
}
