package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-ordered triangle counting (edge-iterator form).
  *
  * Every undirected edge is oriented toward its higher-(degree, id)
  * endpoint, which bounds out-degrees by O(√m) on any graph; the
  * count is then Σ over oriented edges (u→v) of |N⁺(u) ∩ N⁺(v)| —
  * each triangle contributes exactly once, at the edge between its
  * two lowest-ordered vertices. The out-neighbor sets materialize as
  * sorted array columns (Σ|N⁺| = m entries total), the two adjacency
  * joins are plain equi-joins on the edge endpoints, and the
  * intersection is a narrow per-row operation — nothing quadratic in
  * degree ever hits a shuffle, unlike the wedge self-join, whose
  * O(m^1.5) intermediate (~20M rows on the sf0.1 co-purchase graph,
  * 13s) this replaces (~1s).
  *
  * Input: `edges` with two long columns `u`, `v` (undirected, may
  * contain duplicates/self-loops — both are normalized away).
  */
object TriangleCount {

  def count(edges: DataFrame): Long = stats(edges)._2

  /** (distinct undirected edge count, triangle count) in one pass
    * over one persisted normalized edge set — callers needing both
    * must not pay the normalization shuffle twice.
    */
  def stats(edges: DataFrame): (Long, Long) = {
    import org.apache.spark.storage.StorageLevel
    // e feeds deg AND the orientation join; oriented feeds adj AND the
    // two adjacency joins — without persists the upstream edge
    // derivation (often an expensive self-join) recomputes per reuse.
    val e = edges.select(
      least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // deg and adj are node-count-sized (≪ edge count); below this
      // edge bound they broadcast — the whole count then shuffles the
      // edge set only for distinct/deg/adj, never for the joins. Past
      // it, Catalyst's shuffled joins take over (adj no longer fits).
      val nEdges = e.count()
      // deg/adj are ≤ edge-count rows of (long, long)/(long, array) —
      // ~8-16 B per edge serialized, so the default cutoff keeps the
      // broadcast ≤ ~0.8 GB, inside a production executor's budget.
      // Measured at 24M edges (scale rehearsal): broadcast path is
      // ~3× cheaper per edge than the shuffled fallback, so prefer it
      // as long as the relation fits. Conf-tunable for small-memory
      // clusters (and for forcing the fallback in tests).
      val cutoff = edges.sparkSession.conf
        .getOption("spark.graft.triangles.broadcastMaxEdges")
        .map(_.toLong).getOrElse(50_000_000L)
      val broadcastable = nEdges < cutoff
      def maybeB(df: DataFrame): DataFrame = if (broadcastable) broadcast(df) else df
      // Past the cutoff the adjacency joins sort-merge, and every
      // shuffled row carries its neighbor ARRAY (~avg-degree longs) —
      // at the session's default partition count a partition of a
      // big graph is hundreds of MB and 32 concurrent sorts starve
      // the execution-memory pool into a spill-retry spin (observed
      // live at 24M edges / 32 partitions: every task wedged in
      // HeapMemoryAllocator). Widen the array-carrying exchanges to
      // ~250k edges/partition (capped) via EXPLICIT hash
      // repartitioning on the join keys — repartition(n, key)
      // satisfies the downstream join/agg's required distribution, so
      // no second exchange is added; unlike mutating
      // spark.sql.shuffle.partitions (the round-3 shape), this is
      // invisible to concurrent queries on the same session and safe
      // under concurrent stats() calls.
      val spark = edges.sparkSession
      val wideN = math.min(4096L, math.max(
        spark.conf.get("spark.sql.shuffle.partitions").toLong,
        nEdges / 250_000L)).toInt
      def widen(df: DataFrame, key: String): DataFrame =
        if (broadcastable) df else df.repartition(wideN, col(key))
      val deg = maybeB(e.select(explode(array(col("u"), col("v"))).as("node"))
        .groupBy("node")
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("deg")))
      val oriented = e
        .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
        .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
        .select(
          when(col("du") < col("dv") ||
               (col("du") === col("dv") && col("u") < col("v")),
            struct(col("u").as("src"), col("v").as("dst")))
          .otherwise(struct(col("v").as("src"), col("u").as("dst"))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      try {
        // the repartition feeds the partial agg NARROW (src,dst) rows
        // and leaves the aggregate (whose buffers carry the arrays)
        // already clustered at wideN — no array-carrying exchange
        val adj = maybeB(widen(oriented, "src").groupBy(col("src"))
          .agg(sort_array(collect_list(col("dst"))).as("nbrs")))
        // adjacency lists are sorted ASC ⇒ the native merge-count
        // kernel replaces array_intersect's per-row hash-set build
        // adj's agg output is hash(src, wideN) and the alias-aware
        // projection keeps that through the src→dst rename, so the
        // only array-carrying exchange left is the unavoidable one:
        // re-keying the (edge, nbrs_u) rows from src to dst — widened
        val counted = widen(oriented, "src")
          .join(adj.select(col("src"), col("nbrs").as("nbrs_u")), "src")
          .transform(j => widen(j, "dst"))
          .join(adj.select(col("src").as("dst"), col("nbrs").as("nbrs_v")),
            Seq("dst"), "left")
          .select(coalesce(
            call_function("graft_sorted_isect_count",
              col("nbrs_u"), col("nbrs_v")), lit(0))
            .cast("long").as("tri"))
          .agg(sum(col("tri"))).head()
        (nEdges, if (counted.isNullAt(0)) 0L else counted.getLong(0))
      } finally oriented.unpersist()
    } finally e.unpersist()
  }

  /** Reference implementation: naive id-ordered 3-way self-join.
    * O(Σ deg²) wedges — fine on small/uniform graphs, the oracle for
    * the oriented path.
    */
  def countNaive(edges: DataFrame): Long = {
    val e = edges.select(
      least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    e.as("e1")
      .join(e.as("e2"), col("e2.u") === col("e1.u") && col("e2.v") > col("e1.v"))
      .join(e.as("e3"), col("e3.u") === col("e1.v") && col("e3.v") === col("e2.v"))
      .count()
  }
}
