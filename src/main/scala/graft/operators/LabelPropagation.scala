package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (Raghavan et al.
  * 2007, the near-linear community algorithm) as a fixed-round
  * iterative dataflow: every node starts in its own community (label
  * = node id) and each round adopts the label most frequent among its
  * neighbours, ties broken toward the SMALLEST label — the
  * deterministic variant (the paper's random tie-break would not be
  * oracle-checkable; synchronous + min-label is the standard
  * reproducible form).
  *
  * Scale shape per round: one join propagating labels across edges
  * (keyed on the edge partitioning the caller set up once), one
  * (node, label) count aggregation, and one per-node argmax window —
  * window input per node is bounded by its distinct neighbour labels
  * ≤ degree, so the window never sees corpus-scale partitions.
  * Rounds snapshot through [[Snapshots.persistRound]] like
  * [[PageRank]]/[[ShortestPaths]].
  *
  * Deterministic: synchronous updates (all nodes flip on the same
  * previous-round labels) + total tie order (count desc, label asc).
  */
object LabelPropagation {

  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 0)
    // distinct like PageRank: duplicate input edges would otherwise
    // weight neighbour votes by multiplicity, silently changing the
    // documented most-frequent/min-label semantics
    val e = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v")).distinct().cache()
    var labels = e.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
    var prevRdd: Option[RDD[Row]] = None
    val w = Window.partitionBy(col("node"))
      .orderBy(col("c").desc, col("nlabel"))
    for (_ <- 0 until iters) {
      val next = e.join(labels, e("v") === labels("node"))
        .select(e("u").as("node"), labels("label").as("nlabel"))
        .groupBy(col("node"), col("nlabel")).agg(count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("node"), col("nlabel").as("label"))
      val (snap, rdd) = Snapshots.persistRound(next, prevRdd)
      prevRdd = Some(rdd)
      labels = snap
    }
    e.unpersist()
    labels
  }
}
