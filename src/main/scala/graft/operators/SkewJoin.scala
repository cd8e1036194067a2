package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join via key salting — the manual lever for
  * when AQE's skew-join split can't help (e.g. the skew is in a
  * broadcast-ineligible dimension, or the engine runs with AQE off).
  *
  * Shape: the probe (large, skewed) side appends a random-ish salt in
  * [0, saltFactor) derived deterministically from a tiebreaker column
  * (no rand(): keeps the query replayable and partition-stable). The
  * build side explodes each row into all saltFactor salts. The join
  * key becomes (key, salt), splitting each hot key's rows across
  * saltFactor reducers.
  *
  * Cost model: build side is replicated ×saltFactor — use on the
  * smaller side of a shuffle join where one or few keys dominate the
  * probe side. Equivalent rows out: each probe row still meets each
  * matching build row exactly once (one salt matches).
  */
object SkewJoin {

  /** Inner equi-join of `probe` (skewed, large) with `build` on
    * `key`, salted with `saltFactor`. `probeTiebreak` is any
    * probe-side column with good per-key spread (an id) used to derive
    * the deterministic salt. Null tiebreak values fall back to a hash
    * of the whole probe row: without the fallback every null-tiebreak
    * row of a hot key hashes to the same constant and lands in one
    * salt bucket, silently degrading the anti-skew guarantee to
    * unsalted for exactly those rows.
    */
  def saltedInnerJoin(probe: DataFrame, build: DataFrame, key: String,
      probeTiebreak: String, saltFactor: Int = 8): DataFrame = {
    require(saltFactor >= 1)
    // whole-row spread for null tiebreaks — over HASHABLE columns only:
    // xxhash64 rejects MapType (and map-bearing nesting) at analysis,
    // and a probe frame with such a column must not fail for rows whose
    // tiebreak isn't even null
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val spreadCols = probe.schema.fields
      .filter(f => hashable(f.dataType)).map(f => col(f.name)).toSeq
    // an all-map frame can't be salted at all — the tiebreak hash in
    // the otherwise() branch below would fail analysis on the same
    // map column anyway, so fail here with a message instead
    require(spreadCols.nonEmpty,
      "saltedInnerJoin: probe has no hashable (non-map) column to spread on")
    val rowSpread = xxhash64(spreadCols: _*)
    val salted = probe.withColumn("_salt",
      pmod(when(col(probeTiebreak).isNull, rowSpread)
        .otherwise(xxhash64(col(probeTiebreak))), lit(saltFactor)).cast("int"))
    val exploded = build.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }

  /** Per-key row counts of the top `n` heaviest keys — the diagnostic
    * used to decide whether salting (or a broadcast) is warranted.
    */
  def keyHistogram(df: DataFrame, key: String, n: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc, col(key))
      .limit(n)
}
