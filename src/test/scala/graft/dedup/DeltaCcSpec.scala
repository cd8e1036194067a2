package graft.dedup

import graft.SparkTestBase

class DeltaCcSpec extends SparkTestBase {
  import spark.implicits._

  // the alternating engine: O(log n) rounds, converges on the long
  // chains these fixtures plant (HashMin would need diameter rounds)
  private def labelsOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.componentsAlternating(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  /** appendEdges(labels(E1), E2) must equal components(E1 ∪ E2) for
    * every node — through BOTH of appendEdges' internal CC dispatch
    * branches (driver union-find below the bound, alternating star
    * when forced above it).
    */
  private def check(e1: Seq[(Long, Long)], e2: Seq[(Long, Long)]): Unit = {
    val full = labelsOf(e1 ++ e2)
    val base = ConnectedComponents.componentsAlternating(e1.toDF("a", "b"))
    for (bound <- Seq(1L << 20, 0L)) {
      val got = ConnectedComponents
        .appendEdges(base, e2.toDF("a", "b"), maxLocalEdges = bound)
        .as[(Long, Long)].collect().toMap
      assert(got == full,
        s"delta labels != full recompute (maxLocalEdges=$bound): " +
          s"delta=$got full=$full")
    }
  }

  test("random graph: delta labels equal full recompute (both branches)") {
    // deterministic LCG-ish pseudo-random edges over 60 nodes
    def edge(i: Long) = ((i * 7919) % 60, (i * 104729 + 13) % 60)
    val e1 = (0L until 40L).map(edge).filter(e => e._1 != e._2)
    val e2 = (40L until 55L).map(edge).filter(e => e._1 != e._2)
    check(e1, e2)
  }

  test("chain graph: delta edge fuses two long chains") {
    val e1 = (0L until 20L).map(i => (i, i + 1)) ++
      (100L until 120L).map(i => (i, i + 1))
    // one bridging edge merges two diameter-20 components
    check(e1, Seq((20L, 100L)))
  }

  test("planted: new nodes, new-min relabel, isolated-pair delta, empty delta") {
    val e1 = Seq((10L, 11L), (12L, 13L), (20L, 21L))
    // Δ introduces: a brand-new pair (50,51); a new node 5 that becomes
    // the NEW MIN of component {10,11}; a merge of two old components
    check(e1, Seq((50L, 51L), (5L, 11L), (13L, 20L)))
    // empty delta: labels unchanged
    val base = ConnectedComponents.components(e1.toDF("a", "b"))
    val same = ConnectedComponents
      .appendEdges(base, Seq.empty[(Long, Long)].toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(same == labelsOf(e1))
  }

  test("delta touches only its components: untouched labels pass through verbatim") {
    val e1 = (0L until 10L).map(i => (2 * i, 2 * i + 1)) // 10 disjoint pairs
    val base = ConnectedComponents.components(e1.toDF("a", "b"))
    val updated = ConnectedComponents
      .appendEdges(base, Seq((1L, 2L)).toDF("a", "b")) // merges {0,1}+{2,3}
      .as[(Long, Long)].collect().toMap
    assert(updated(0L) == 0L && updated(1L) == 0L &&
      updated(2L) == 0L && updated(3L) == 0L)
    (4L until 20L).foreach(n => assert(updated(n) == (n / 2) * 2))
  }
}
