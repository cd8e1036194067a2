package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT global cumulative sums — the two-phase scan that
  * replaces the classic scale trap of `Window.orderBy(x)` with no
  * partition key (one task sorts and scans the entire table):
  *
  *  1. range-partition on the order column (parallel sort, the same
  *     exchange a global ORDER BY pays);
  *  2. per-partition partial sums — ONE row per partition comes back
  *     to the driver (bounded by the partition count, never the
  *     data), prefix-scanned into per-partition offsets;
  *  3. offsets rejoin as a broadcast map and a WITHIN-partition
  *     running window (parallel across partitions) finishes the
  *     scan: cum(x) = offset(partition) + running(x within
  *     partition).
  *
  * The RANGE partitioning in step 1 is LOAD-BEARING for correctness,
  * not just balance (ADVICE r9): the offset of partition p is the sum
  * of partitions 0..p-1, which equals the true prefix only because
  * partition-id order coincides with `orderCol` value order under
  * repartitionByRange — under hash partitioning the same offsets
  * would be wrong. What correctness does NOT depend on is WHERE the
  * sampled range bounds fall (any split of the sorted domain yields
  * the same result; only balance rides on the sampling). Input is
  * materialized once (localCheckpoint) so the partition ids seen by
  * phase 2 and phase 3 are the same physical layout.
  *
  * This is the engine's primitive for exact ECDFs / rank statistics
  * at 100 TB (see q_ks_test): everything downstream of the one range
  * exchange is embarrassingly parallel.
  */
object PrefixScan {

  /** `df` plus `cum_<c>` (running sum, inclusive of the current row)
    * for each `c` in `sumCols` (integral columns), ordered by
    * `orderCol`. Rows with equal `orderCol` must be unique (group
    * first — an ECDF wants one row per value anyway); the within-
    * partition window breaks no ties because range partitioning
    * never splits equal keys across partitions.
    */
  def withCumSums(df: DataFrame, orderCol: String, sumCols: Seq[String],
      nPartitions: Int = 32): DataFrame =
    withCumSumsBy(df, Seq(orderCol), sumCols, nPartitions)

  /** [[withCumSums]] over a COMPOSITE order key: rows are ordered by
    * `orderCols` lexicographically (range partitioning and the
    * within-partition window both use the full key), so callers whose
    * primary order column has ties can append a tiebreaker column
    * instead of packing a synthetic unique key — e.g. a rank statistic
    * ordered by (value, id). The combination must be unique per row.
    */
  def withCumSumsBy(df: DataFrame, orderCols: Seq[String],
      sumCols: Seq[String], nPartitions: Int = 32): DataFrame = {
    require(sumCols.nonEmpty, "need at least one column to scan")
    require(orderCols.nonEmpty, "need at least one order column")
    val spark = df.sparkSession
    val ranged = df
      .repartitionByRange(nPartitions, orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val partRows = ranged.groupBy(col("__pid"))
      .agg(sumCols.map(c => sum(col(c)).as(c)).head,
        sumCols.map(c => sum(col(c)).as(c)).tail: _*)
      .collect()
    val partSums: Map[Int, Seq[Long]] = partRows.map { r =>
      r.getInt(0) -> sumCols.indices.map(i =>
        if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1))
    }.toMap
    // exclusive prefix over ALL pids 0..n-1 (empty partitions emit no
    // aggregate row but still need an offset)
    val zero = Seq.fill(sumCols.size)(0L)
    val offsets = (0 until nPartitions).scanLeft(zero) { (acc, pid) =>
      val s = partSums.getOrElse(pid, zero)
      acc.zip(s).map { case (a, b) => a + b }
    }
    import spark.implicits._
    val offDf = broadcast(
      (0 until nPartitions).map(p => (p, offsets(p)))
        .toDF("__pid", "__off"))
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = ranged.join(offDf, "__pid")
    sumCols.zipWithIndex.foldLeft(joined) { case (d, (c, i)) =>
      d.withColumn(s"cum_$c",
        sum(col(c)).over(w) + element_at(col("__off"), i + 1))
    }.drop("__pid", "__off")
  }
}
