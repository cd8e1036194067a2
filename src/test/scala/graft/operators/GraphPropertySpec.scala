package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Property-based invariants for the iterative graph operators,
  * against generated graphs (fixed-seed scalacheck Gens, the
  * PropertySpec harness): [[ShortestPaths]] vs an in-memory BFS, and
  * [[LabelPropagation]] vs an in-memory synchronous min-label LPA —
  * the distributed dataflow must equal the sequential reference on
  * ANY graph, not just the corpus-derived ones the oracles cover.
  */
class GraphPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(1337L + i)))

  /** Undirected graph as a symmetric edge list over nodes 0..n-1,
    * ~avg-degree 3 — sparse enough that 4-hop BFS does not settle
    * everything, dense enough that it reaches beyond hop 1.
    */
  private val graphGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 30)
    m <- Gen.choose(1, 3 * n)
    us <- Gen.listOfN(m, Gen.choose(0L, n - 1L))
    vs <- Gen.listOfN(m, Gen.choose(0L, n - 1L))
  } yield us.zip(vs).filter { case (u, v) => u != v }
    .flatMap { case (u, v) => List((u, v), (v, u)) }.distinct

  private def adjacency(edges: List[(Long, Long)]): Map[Long, List[Long]] =
    edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap

  test("BFS equals in-memory reference on arbitrary graphs") {
    for (edges <- samples(graphGen, 12) if edges.nonEmpty) {
      val adj = adjacency(edges)
      val src = edges.map(_._1).min
      var dist = Map(src -> 0L)
      var frontier = Set(src)
      for (h <- 1 to 4) {
        val next = frontier.flatMap(adj.getOrElse(_, Nil)).filterNot(dist.contains)
        dist ++= next.map(_ -> h.toLong)
        frontier = next
      }
      val e = edges.toDF("u", "v")
      val source = Seq(src).toDF("node")
      val got = ShortestPaths.run(e, "u", "v", source, maxHops = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == dist, s"edges=$edges")
    }
  }

  test("weighted SSSP equals in-memory bounded Bellman-Ford on arbitrary graphs") {
    for (edges <- samples(graphGen, 12) if edges.nonEmpty) {
      def w(u: Long, v: Long) = 1L + (u + v) % 5
      val adj = adjacency(edges)
      val src = edges.map(_._1).min
      // reference: bounded Bellman-Ford, 4 relaxation rounds
      var dist = Map(src -> 0L)
      for (_ <- 1 to 4) {
        val relaxed = dist.toSeq.flatMap { case (u, du) =>
          adj.getOrElse(u, Nil).map(v => v -> (du + w(u, v)))
        }
        dist = (dist.toSeq ++ relaxed).groupBy(_._1)
          .map { case (n, ds) => n -> ds.map(_._2).min }
      }
      val e = edges.map { case (u, v) => (u, v, w(u, v)) }.toDF("u", "v", "w")
      val source = Seq(src).toDF("node")
      val got = ShortestPaths.runWeighted(e, "u", "v", "w", source, maxHops = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == dist, s"edges=$edges")
    }
  }

  test("weighted SSSP: a light 2-edge detour beats a heavy direct edge") {
    // direct edge 1-3 weighs 10; the detour 1-2-3 weighs 2+2=4 and
    // must win — the case BFS (hop-minimal) cannot express
    val raw = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 2L))
    val e = (raw ++ raw.map { case (u, v, w) => (v, u, w) }).toDF("u", "v", "w")
    val src = Seq(1L).toDF("node")
    val got = ShortestPaths.runWeighted(e, "u", "v", "w", src, maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 2L, 3L -> 4L))
  }

  test("LPA equals in-memory synchronous min-label reference on arbitrary graphs") {
    for (edges <- samples(graphGen, 12) if edges.nonEmpty) {
      val adj = adjacency(edges)
      val nodes = edges.map(_._1).distinct
      var labels = nodes.map(n => n -> n).toMap
      for (_ <- 0 until 3) {
        labels = nodes.map { n =>
          val counts = adj(n).map(labels).groupBy(identity)
            .map { case (l, ls) => (l, ls.size) }
          // most frequent neighbour label, ties toward the smallest
          n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }.toMap
      }
      val e = edges.toDF("u", "v")
      val got = LabelPropagation.run(e, "u", "v", iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == labels, s"edges=$edges")
    }
  }
}
