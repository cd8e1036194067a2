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

  /** Atomic publish ([[graft.tools.Artifacts.publish]], VERDICT r11
    * next-round #2): the three-directory layout lands in a fresh
    * committed generation, so a rebuild racing a concurrent [[load]]
    * can never be read torn (new params, old buckets).
    */
  def save(index: Index, path: String): Unit = {
    val spark = index.buckets.sparkSession
    import spark.implicits._
    graft.tools.Artifacts.publish(spark, path) { gen =>
      index.buckets.write.mode("overwrite").parquet(s"$gen/buckets")
      index.shingles.write.mode("overwrite").parquet(s"$gen/shingles")
      Seq((index.shingleK, index.bands, index.rowsPerBand))
        .toDF("shingle_k", "bands", "rows_per_band")
        .repartition(1).write.mode("overwrite").parquet(s"$gen/params")
    }
    ()
  }

  def load(spark: SparkSession, path: String, idCol: String): Index = {
    val gen = graft.tools.Artifacts.requireGen(spark, path)
    // by NAME, not position: a column reorder in save must fail loudly
    // here, never silently swap shingle_k/bands and band differently
    // than the saved index (ADVICE r10)
    val p = spark.read.parquet(s"$gen/params").collect()(0)
    val bucketsRaw = spark.read.parquet(s"$gen/buckets")
    val shinglesRaw = spark.read.parquet(s"$gen/shingles")
    // the tombstone sidecar (if any) is consulted HERE, so every
    // classify over a loaded index sees the post-delete corpus with
    // zero changes to the probe path — an anti-join against the
    // bounded tombstone set (broadcast-sized by the compaction
    // cadence), exactly the q_cdc tombstone shape applied to an index
    val (buckets, shingles) = tombstones(spark, gen) match {
      case Some(t) =>
        (bucketsRaw.join(t, bucketsRaw(idCol) === t("id"), "left_anti"),
          shinglesRaw.join(t, shinglesRaw(idCol) === t("id"), "left_anti"))
      case None => (bucketsRaw, shinglesRaw)
    }
    Index(buckets, shingles,
      idCol, p.getAs[Int]("shingle_k"), p.getAs[Int]("bands"),
      p.getAs[Int]("rows_per_band"))
  }

  private def tombstones(spark: SparkSession, path: String): Option[DataFrame] =
    if (graft.tools.Artifacts.exists(spark, s"$path/tombstones"))
      Some(spark.read.parquet(s"$path/tombstones"))
    else None

  /** Logical delete (takedowns/retractions — the maintenance
    * operation [[append]] cannot express): append the ids to a
    * tombstone sidecar; no bucket or shingle file is touched
    * (spec-asserted). [[load]] consults the sidecar, so classify
    * after a delete behaves EXACTLY like a rebuild without the
    * deleted docs (the hash family is corpus-independent — removing
    * rows changes no other row's keys). Cost ∝ |ids| per call plus
    * |tombstones| per classify; [[compact]] folds the sidecar into
    * the layout on the retrain cadence. A tombstoned id stays deleted
    * until compaction — re-ingesting it needs a compact first.
    */
  def delete(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String): Unit =
    ids.select(col(idCol).as("id")).distinct()
      .write.mode("append").parquet(
        s"${graft.tools.Artifacts.requireGen(spark, path)}/tombstones")

  /** Fold the tombstone sidecar into the layout: rewrite buckets and
    * shingles without the deleted ids, then remove THOSE ids from the
    * sidecar. The tombstone set is SNAPSHOTTED once (localCheckpoint)
    * before any rewrite (ADVICE r11): both rewrites filter against
    * the same frozen set — never two different reads of a sidecar a
    * concurrent delete() may be appending to — and a delete landing
    * mid-compact SURVIVES in the sidecar instead of being silently
    * resurrected. Each directory swap is rename-aside
    * ([[graft.tools.Artifacts.replaceDir]]); a crash mid-compact
    * leaves a complete old or new layout per directory plus the
    * sidecar, so no delete is ever lost. Run on the same cadence as
    * an IVF retrain — between compactions deletes stay O(|ids|).
    */
  def compact(spark: SparkSession, path: String, idCol: String): Unit =
    graft.tools.Artifacts.foldTombstones(spark,
      graft.tools.Artifacts.requireGen(spark, path),
      Seq(("buckets", idCol, Nil), ("shingles", idCol, Nil)))

  /** Incremental maintenance: band + shingle ONLY the new docs under
    * the saved params and append their rows — cost ∝ |newDocs|, no
    * corpus re-read, no rewrite of existing files (spec-asserted).
    * Because the hash family is corpus-independent, an appended index
    * classifies EXACTLY like a rebuild over corpus ∪ Δ — there is no
    * IVF-style drift to monitor.
    */
  def append(spark: SparkSession, path: String, newDocs: DataFrame,
      idCol: String, textCol: String): Unit = {
    val gen = graft.tools.Artifacts.requireGen(spark, path)
    val p = spark.read.parquet(s"$gen/params").collect()(0)
    val delta = build(newDocs, idCol, textCol,
      p.getAs[Int]("shingle_k"), p.getAs[Int]("bands"),
      p.getAs[Int]("rows_per_band"))
    delta.buckets.write.mode("append").parquet(s"$gen/buckets")
    delta.shingles.write.mode("append").parquet(s"$gen/shingles")
  }

  /** Bucket-occupancy view: (band_idx, band_hash, n) over the LSH
    * bucket table — the observable that drives classify COST for the
    * lexical index: a probe doc pays the population of every bucket
    * it collides with (candidate generation is the bucket join;
    * exact-Jaccard verify work is the sum of its buckets'
    * populations). One aggregate over the bucket side; the RESULT is
    * distinct-bucket-sized, so read it through [[skewRatio]] or a
    * top-N, never a collect. Completes observability parity across
    * the serving indexes ([[graft.similarity.IvfIndex.occupancy]] /
    * `SemanticIndex.occupancy` are the vector twins).
    */
  def occupancy(index: Index): DataFrame =
    index.buckets.groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("n"))

  /** Hot-bucket diagnostic over [[occupancy]]: max bucket population
    * / mean — ≈1 is the uniform-hash ideal; a climbing ratio means
    * some bucket's verify cost dominates any probe that lands in it
    * (boilerplate-heavy corpora produce exactly this). Unlike IVF
    * there is NO retrain lever — the hash family is
    * corpus-independent, so the mitigations are a per-bucket
    * candidate cap (the `maxBucket` pattern [[Dedup.simhashNearDups]]
    * uses) or tighter banding; this ratio is what tells an operator
    * to reach for one BEFORE a daily batch stalls on a mega-bucket.
    * Bounded: one two-value aggregate over [[occupancy]].
    */
  def skewRatio(index: Index): Double = {
    val occ = occupancy(index).agg(
      max(col("n")).cast("double").as("mx"),
      avg(col("n")).as("mean")).collect()(0)
    if (occ.isNullAt(1) || occ.getDouble(1) == 0.0) 0.0
    else occ.getDouble(0) / occ.getDouble(1)
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
