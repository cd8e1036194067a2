package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shuffle-safe time-range join. A raw inequality join
  * (`r.ts BETWEEN l.ts - before AND l.ts + after`) has no equi-key, so
  * Spark plans a broadcast-nested-loop or cartesian product — O(|L|·|R|)
  * and a 100TB non-starter. Binning restores an equi-key: timestamps
  * are bucketed into windows of `before+after` seconds, each left row
  * probes the (at most two) bins its range can touch, the join runs as
  * an ordinary shuffle/broadcast HASH join on (bin [, keys]), and the
  * exact range predicate filters inside the bin pairs. Every matching
  * pair meets exactly once (a right row has one bin; the left row's
  * probed bins are distinct).
  */
object RangeJoin {

  /** Pairs of (left row, right row) with
    * `r.ts ∈ [l.ts - beforeSec, l.ts + afterSec]`, optionally also
    * equi-matched on `keyCols` (same names both sides). Right columns
    * are prefixed `r_` on name collision.
    */
  def bucketedRangeJoin(left: DataFrame, right: DataFrame,
      leftTs: String, rightTs: String, beforeSec: Long, afterSec: Long,
      keyCols: Seq[String] = Nil): DataFrame = {
    require(beforeSec >= 0 && afterSec >= 0 && beforeSec + afterSec > 0)
    val width = beforeSec + afterSec
    val lEpoch = col(leftTs).cast("timestamp").cast("long")
    val rEpoch = col(rightTs).cast("timestamp").cast("long")

    val l = left.withColumn("_bin",
      explode(sequence(
        floor((lEpoch - beforeSec) / width),
        floor((lEpoch + afterSec) / width))))
    val collisions = left.columns.toSet.intersect(right.columns.toSet) -- keyCols
    val rRenamed = collisions.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"r_$c"))
    val rTsName = if (collisions.contains(rightTs)) s"r_$rightTs" else rightTs
    val r = rRenamed.withColumn("_bin",
      floor(col(rTsName).cast("timestamp").cast("long") / width))

    val joined = l.join(r, Seq("_bin") ++ keyCols)
    // bins are computed on floor-to-second epochs (exact coverage:
    // before/after are whole seconds, so floor(l±x) = floor(l)±x), but
    // the final predicate must compare FULL-precision timestamps — a
    // truncated compare would admit pairs up to 1s outside the bound
    joined
      .filter(col(rTsName).cast("timestamp")
        .between(
          col(leftTs).cast("timestamp") - expr(s"INTERVAL $beforeSec SECOND"),
          col(leftTs).cast("timestamp") + expr(s"INTERVAL $afterSec SECOND")))
      .drop("_bin")
  }
}
