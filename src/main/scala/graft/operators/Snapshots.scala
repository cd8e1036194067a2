package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.storage.StorageLevel

/** The one shared round-snapshot pattern for iterative dataflows
  * (PageRank, ConnectedComponents): materialize the round into a
  * persisted Row RDD and restart the next round's plan from it via
  * createDataFrame.
  *
  * What this buys, precisely:
  * - the QUERY PLAN restarts from a leaf each round (analysis/
  *   optimization cost stays bounded instead of growing per round);
  * - the persisted blocks make scheduler re-walks of the RDD ancestry
  *   no-ops (stages behind a cached RDD are skipped) — note the RDD
  *   dependency chain itself is retained, unlike a checkpoint;
  * - the returned RDD handle is one whose unpersist() actually frees
  *   the superseded round's blocks — Dataset.unpersist() after
  *   Dataset.localCheckpoint() is a CacheManager lookup that never
  *   finds the checkpoint RDD and silently leaks every round.
  *
  * Ordering matters: the new round MUST materialize (count) before the
  * previous round frees, or a task retry could recompute from a
  * missing parent.
  */
object Snapshots {

  def persistRound(df: DataFrame, prev: Option[RDD[Row]])
      : (DataFrame, RDD[Row]) = {
    val rdd = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    rdd.count()
    prev.foreach(_.unpersist(blocking = false))
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd)
  }

  /** [[persistRound]] fused with a convergence metric: the
    * materializing action is `rdd.filter(pred).count()`, which fully
    * computes (and therefore caches) every partition of the snapshot
    * AND returns the matching-row count in the SAME job. Iterative
    * dataflows that gate on a per-round count (ConnectedComponents'
    * "labels changed this round") would otherwise pay rounds×2 driver
    * actions — one to materialize, one to count.
    */
  def persistRoundCounted(df: DataFrame, prev: Option[RDD[Row]],
      pred: Row => Boolean): (DataFrame, RDD[Row], Long) = {
    val rdd = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    val matched = rdd.filter(pred).count()
    prev.foreach(_.unpersist(blocking = false))
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd, matched)
  }
}
