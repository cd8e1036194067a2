package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge DataFrame — the iterative
  * dataflow shape (rank state re-joined to a static edge relation per
  * round) that a declarative single query can't express. Simplified
  * model: dangling mass is dropped, PR_{t+1}(v) = (1−d)/N +
  * d·Σ_{u→v} PR_t(u)/deg(u) over the distinct edge set.
  *
  * Scale shape per round: edges ⋈ ranks on src (both hash-partitioned
  * on the key after the first round — the exchange is reused), one
  * aggregation on dst, one left join back to the node set. Rounds
  * snapshot through [[Snapshots.persistRound]] (plan restarts from a
  * leaf, superseded round's blocks actually free — see its doc for
  * why Dataset.localCheckpoint+unpersist silently leaks instead).
  * The returned frame reads the final round's persisted snapshot.
  * Deterministic given a deterministic edge set: every arithmetic
  * step is the same expression tree each round.
  */
object PageRank {

  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 0)
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct().cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val n = nodes.count()
    require(n > 0, "PageRank needs a non-empty edge set (1/n seed rank)")
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    var prevRdd: Option[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]] = None
    for (_ <- 0 until iters) {
      val mass = e.join(ranks, e("src") === ranks("node"))
        .join(deg, "src")
        .select(col("dst").as("node"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_mass"))
      val next = nodes.join(mass, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("in_mass"), lit(0.0))).as("rank"))
      val (checkpointed, rdd) = Snapshots.persistRound(next, prevRdd)
      prevRdd = Some(rdd)
      ranks = checkpointed
    }
    e.unpersist(); nodes.unpersist()
    ranks
  }
}
