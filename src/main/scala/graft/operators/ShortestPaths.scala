package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Bounded multi-round BFS over an edge DataFrame: unweighted
  * single-source shortest paths up to `maxHops`, the third iterative
  * graph dataflow next to [[PageRank]] and
  * [[graft.dedup.ConnectedComponents]].
  *
  * Semantics: hop distance from `source` (a 1-row DataFrame with a
  * `node` column, so the seed can itself be the result of a query —
  * no driver-side action to pick it). Nodes unreached within
  * `maxHops` are absent from the output, the natural distributed
  * form (emitting "infinity" rows would materialize the whole node
  * set for no information).
  *
  * Scale shape per round: frontier ⋈ edges on the edge partitioning
  * key (the caller pre-partitions edges once; every round reuses that
  * exchange), then a min-aggregate merging the freshly reached nodes
  * into the distance table. BFS expands each node exactly once —
  * the frontier filter (`dist == round-1`) keeps settled nodes out of
  * the join, so total join work across all rounds is O(m), not
  * O(rounds·m). Rounds snapshot through [[Snapshots.persistRound]]
  * (bounded plan depth, superseded blocks actually freed).
  *
  * Deterministic: unweighted BFS discovers nodes in nondecreasing
  * hop order, so the min-merge is order-insensitive.
  */
object ShortestPaths {

  /** [[run]] seeded at the minimum node of the edge set — computed
    * from the operator's own MATERIALIZED edge cache, so the (often
    * expensive) edge-derivation lineage is never executed a second
    * time just to pick the source (a caller-side `edges.agg(min)`
    * would recompute it).
    */
  def runFromMin(edges: DataFrame, srcCol: String, dstCol: String,
      maxHops: Int): DataFrame =
    run(edges, srcCol, dstCol, source = null, maxHops)

  /** The caller's source frame, or the min node of the MATERIALIZED
    * edge cache. The min is collected (one tiny job over the cached
    * rows, bounded output) rather than left as an aggregate plan —
    * an agg over `e` inside `dist`'s lineage would be a self-join
    * with every round's frontier ⋈ e (ambiguous-attribute analysis
    * error), and re-deriving from the RAW edges would re-execute the
    * caller's whole derivation pipeline.
    */
  private def minSource(e: DataFrame, source: DataFrame): DataFrame = {
    if (source != null)
      source.select(col("node").cast("long").as("node"))
    else {
      val row = e.agg(min(col("u")).as("node")).head()
      val spark = e.sparkSession
      if (row.isNullAt(0)) // empty edge set → empty result, not an NPE
        spark.range(0).select(col("id").as("node"))
      else
        spark.range(1).select(lit(row.getLong(0)).as("node"))
    }
  }

  def run(edges: DataFrame, srcCol: String, dstCol: String,
      source: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0)
    val e = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v")).cache()
    // materialize the cache NOW: every round's join AND any
    // source-from-edges aggregate below must hit it, not re-derive
    e.count()
    var dist = minSource(e, source).withColumn("dist", lit(0))
    var prevRdd: Option[RDD[Row]] = None
    for (i <- 1 to maxHops) {
      val frontier = dist.filter(col("dist") === lit(i - 1))
      val reached = frontier.join(e, frontier("node") === e("u"))
        .select(e("v").as("node"), lit(i).as("dist"))
      val merged = dist.union(reached)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      val (snap, rdd) = Snapshots.persistRound(merged, prevRdd)
      prevRdd = Some(rdd)
      dist = snap
    }
    e.unpersist()
    dist.select(col("node"), col("dist").cast("long").as("dist"))
  }

  /** Weighted bounded-hop SSSP — Bellman-Ford with `maxHops` rounds:
    * the minimum total edge weight over paths of at most `maxHops`
    * edges. Unlike [[run]]'s BFS, a settled node can IMPROVE when a
    * heavier-but-shorter prefix is beaten by a lighter longer path,
    * so every round relaxes from the full distance table (O(rounds·m)
    * join work — the classic Bellman-Ford bound; a frontier
    * optimization would need improvement tracking, not worth it at 4
    * rounds). Integer weights keep the min-merge exact — no float
    * path-sum ordering concerns.
    */
  /** [[runWeighted]] seeded at the minimum node — same
    * materialized-cache rationale as [[runFromMin]]. */
  def runWeightedFromMin(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, maxHops: Int): DataFrame =
    runWeighted(edges, srcCol, dstCol, weightCol, source = null, maxHops)

  def runWeighted(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, source: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0)
    val e = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"),
      col(weightCol).cast("long").as("w")).cache()
    e.count()
    var dist = minSource(e, source).withColumn("dist", lit(0L))
    var prevRdd: Option[RDD[Row]] = None
    for (_ <- 1 to maxHops) {
      val relaxed = dist.join(e, dist("node") === e("u"))
        .select(e("v").as("node"), (col("dist") + col("w")).as("dist"))
      val merged = dist.union(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      val (snap, rdd) = Snapshots.persistRound(merged, prevRdd)
      prevRdd = Some(rdd)
      dist = snap
    }
    e.unpersist()
    dist.select(col("node"), col("dist"))
  }
}
