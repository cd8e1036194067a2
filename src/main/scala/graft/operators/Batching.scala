package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batching / pagination (reference: syllabus_ai_graph.py:146-182).
  *
  * The reference slices a plan list `plan[start : start+batch_size]`
  * inside a driver loop. Relationally that is row_number bucketing:
  * `batch_id = floor((row_number over (order by k) - 1) / size)` —
  * the partial final batch falls out for free.
  *
  * Scale caveat: a global row_number needs a total order, which on a
  * cluster means a single-partition window — fine for plan-sized data
  * (the reference's plans are tens of rows), wrong for billions. For
  * large inputs use `batchIdsScalable`, which computes contiguous
  * global ids from per-partition counts (two narrow passes, no global
  * shuffle to one partition).
  */
object Batching {

  /** Exact reference semantics: global order by `ord`, buckets of
    * `size`, last bucket possibly partial. Single-partition window —
    * use only when the input is plan-sized or a global total order is
    * genuinely required.
    */
  def withBatchId(df: DataFrame, size: Int, ord: Column*): DataFrame = {
    val w = Window.orderBy(ord: _*)
    df.withColumn("batch_id",
      floor((row_number().over(w) - 1) / size))
  }

  /** Scalable contiguous global ids: sort within partitions by `ord`
    * after a range repartition, then offset per-partition sequence by
    * the cumulative count of earlier partitions (computed from a tiny
    * driver-side count collect — O(numPartitions), not O(rows)).
    * Produces the same batch_id assignment as [[withBatchId]] for a
    * globally sorted input, without funnelling rows through one task.
    */
  def withBatchIdScalable(df: DataFrame, size: Int, ord: Column*): DataFrame = {
    val sorted = df.repartitionByRange(ord: _*).sortWithinPartitions(ord: _*)
    // The counts pass and the id-assignment pass must see the SAME
    // partition contents; persist so a nondeterministic upstream
    // (sample, rand-derived, unstable source order) is computed once,
    // not re-derived differently on the second pass. persist() is a
    // best-effort barrier though — a lost cache block recomputes from
    // lineage, which for a nondeterministic source can differ between
    // the passes. When the session has a checkpoint dir, ALSO write a
    // reliable checkpoint so recomputation replays identical data; on
    // a cluster with lossy executors and nondeterministic input, set
    // one (sc.setCheckpointDir) or materialize the input yourself.
    val rdd = sorted.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) rdd.checkpoint()
    val counts = rdd.mapPartitionsWithIndex { case (i, it) =>
      Iterator((i, it.size.toLong))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val spark = df.sparkSession
    val withId = rdd.mapPartitionsWithIndex { case (i, it) =>
      var n = offsets(i)
      it.map { row => val r = org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (n / size)); n += 1; r }
    }
    // eager localCheckpoint materializes the result from the cached
    // partitions so the input cache can be dropped before returning
    val out = spark.createDataFrame(withId,
      sorted.schema.add("batch_id", org.apache.spark.sql.types.LongType))
      .localCheckpoint()
    rdd.unpersist(blocking = false)
    out
  }
}
