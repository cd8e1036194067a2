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

  /** [[persistRound]] with LINEAGE TRUNCATION: the snapshot RDD is
    * localCheckpoint'd (blocks persist MEMORY_AND_DISK and the
    * dependency chain is CUT once materialized), so a long round loop
    * never accumulates a recursively-serialized ancestry — 60+
    * persistRound generations overflowed the task deserializer's
    * stack in the r15 graph-drift rehearsal (each round's task binary
    * embedded every prior round's full plan). The superseded round
    * still FREES (the RDD handle's unpersist works where the Dataset
    * handle's never finds the checkpoint), which Dataset.localCheckpoint
    * alone cannot do. Fault profile: same as every other
    * localCheckpoint in this repo — truncated blocks cannot be
    * recomputed after executor loss; correct in local mode and
    * accepted cluster-wide for bounded iterative state.
    */
  def checkpointRound(df: DataFrame, prev: Option[RDD[Row]])
      : (DataFrame, RDD[Row]) = {
    val rdd = df.rdd.localCheckpoint()
    rdd.count()
    prev.foreach(_.unpersist(blocking = false))
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd)
  }

  /** [[checkpointRound]] fused with a convergence count, the
    * [[persistRoundCounted]] twin: one job materializes (and
    * truncates) the snapshot AND returns the matching-row count.
    */
  def checkpointRoundCounted(df: DataFrame, prev: Option[RDD[Row]],
      pred: Row => Boolean): (DataFrame, RDD[Row], Long) = {
    val rdd = df.rdd.localCheckpoint()
    val matched = rdd.filter(pred).count()
    prev.foreach(_.unpersist(blocking = false))
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd, matched)
  }

  /** [[checkpointRound]] fused with a per-KEY (rows, flag-misses)
    * aggregate computed in the SAME materializing job — for iterative
    * dataflows whose per-round driver decision is keyed (the graph
    * probeJoin's per-query budget/exhaustion/escalation check): one
    * job snapshots the round AND returns, per key, the row count and
    * the count of rows whose `flag` is FALSE. The fold over
    * per-partition maps touches every partition, so the checkpoint is
    * fully materialized before the superseded round frees. The key
    * domain must be BOUNDED (the map is driver-merged).
    */
  def checkpointRoundKeyed(df: DataFrame, prev: Option[RDD[Row]],
      key: Row => Long, flag: Row => Boolean)
      : (DataFrame, RDD[Row], Map[Long, (Long, Long)]) = {
    val rdd = df.rdd.localCheckpoint()
    val stats = rdd.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
      it.foreach { r =>
        val k = key(r); val (n, u) = m.getOrElse(k, (0L, 0L))
        m(k) = (n + 1, if (flag(r)) u else u + 1)
      }
      Iterator(m.toMap)
    }.fold(Map.empty[Long, (Long, Long)]) { (a, b) =>
      b.foldLeft(a) { case (acc, (k, (n, u))) =>
        val (pn, pu) = acc.getOrElse(k, (0L, 0L))
        acc.updated(k, (pn + n, pu + u))
      }
    }
    prev.foreach(_.unpersist(blocking = false))
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd, stats)
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
