package graft.dedup

import graft.SparkTestBase

class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._

  test("chains, triangles and isolated pairs resolve to min-id components") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (21L, 20L)).toDF("a", "b")
    val comp = ConnectedComponents.components(edges)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("representatives keeps one doc per cluster plus isolated docs") {
    val docs = Seq((1L, "a"), (2L, "a'"), (3L, "b"), (9L, "solo")).toDF("doc_id", "text")
    val edges = Seq((1L, 2L)).toDF("a", "b")
    val kept = ConnectedComponents.representatives(docs, "doc_id", edges)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 9L))
  }

  test("idCol named 'id' and pre-existing 'component' column survive representatives") {
    val docs = Seq((1L, "a", 7L), (2L, "a'", 8L), (5L, "c", 9L))
      .toDF("id", "text", "component")
    val edges = Seq((1L, 2L)).toDF("a", "b")
    val kept = ConnectedComponents.representatives(docs, "id", edges)
    assert(kept.columns.toSeq == Seq("id", "text", "component")) // schema preserved
    assert(kept.select("id").as[Long].collect().toSet == Set(1L, 5L))
  }

  test("throws instead of returning unconverged labels") {
    val n = 30L
    val edges = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalStateException] {
      ConnectedComponents.components(edges, maxIter = 5).collect()
    }
  }

  test("long chain converges within the iteration cap") {
    val n = 30L
    val edges = (1L until n).map(i => (i, i + 1)).toDF("a", "b")
    val comp = ConnectedComponents.components(edges, maxIter = 40)
      .as[(Long, Long)].collect()
    assert(comp.forall(_._2 == 1L))
  }

  test("alternating CC: path-64 converges where HashMin's round budget cannot") {
    // diameter 63: HashMin needs one round per hop and throws at
    // maxIter=20; large-star/small-star halves tree depth per round
    val edges = (1L until 64L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalStateException] {
      ConnectedComponents.components(edges, maxIter = 20).collect()
    }
    val comp = ConnectedComponents.componentsAlternating(edges, maxIter = 20)
      .as[(Long, Long)].collect()
    assert(comp.length == 64 && comp.forall(_._2 == 1L))
  }

  test("alternating CC labels match HashMin on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    // ~3 clusters worth of random edges over 200 nodes + isolated pair
    val edges = (Seq.fill(150)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong)) ++
      Seq((500L, 501L))).toDF("a", "b")
    val hashMin = ConnectedComponents.components(edges, maxIter = 40)
      .as[(Long, Long)].collect().toMap
    val alt = ConnectedComponents.componentsAlternating(edges, maxIter = 20)
      .as[(Long, Long)].collect().toMap
    assert(alt == hashMin)
  }

  test("representatives(alternating=true) survives a chain past HashMin's budget") {
    // 40-doc chain: diameter 39 > maxIter 20. Below the driver edge
    // bound the adaptive local path resolves it for EITHER engine
    // flag; with the local path disabled (maxLocalEdges = 0) the
    // distributed contract still holds — HashMin throws (correctly,
    // rather than under-dedup), the alternating engine resolves it
    val docs = (1L to 40L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val edges = (1L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    assert(ConnectedComponents.representatives(docs, "doc_id", edges)
      .select("doc_id").as[Long].collect().toSeq == Seq(1L))
    intercept[IllegalStateException] {
      ConnectedComponents.representatives(docs, "doc_id", edges,
        maxLocalEdges = 0).collect()
    }
    val kept = ConnectedComponents
      .representatives(docs, "doc_id", edges, alternating = true,
        maxLocalEdges = 0)
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L))
  }

  test("alternating CC: triangles, self-loops and empty edge sets") {
    val edges = Seq((10L, 11L), (11L, 12L), (12L, 10L), (7L, 7L)).toDF("a", "b")
    val comp = ConnectedComponents.componentsAlternating(edges)
      .as[(Long, Long)].collect().toMap
    // self-loop-only node 7 drops out (no real edge), triangle labels to min
    assert(comp == Map(10L -> 10L, 11L -> 10L, 12L -> 10L))
    val empty = ConnectedComponents.componentsAlternating(
      Seq.empty[(Long, Long)].toDF("a", "b"))
    assert(empty.count() == 0L)
  }

  test("adaptive CC matches alternating on random graph, chain, and duplicates") {
    val rnd = new scala.util.Random(7)
    val edges = (Seq.fill(120)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong)) ++
      // chain segment + reversed/duplicate edges + isolated pair
      (200L until 230L).map(i => (i + 1, i)) ++ Seq((500L, 501L), (501L, 500L)))
      .toDF("a", "b")
    val alt = ConnectedComponents.componentsAlternating(edges, maxIter = 20)
      .as[(Long, Long)].collect().toMap
    val local = ConnectedComponents.componentsAdaptiveReleasable(edges)._1
      .as[(Long, Long)].collect().toMap
    assert(local == alt)
    // above the driver bound the distributed engine takes over — same labels
    val dist = ConnectedComponents
      .componentsAdaptiveReleasable(edges, maxLocalEdges = 3)._1
      .as[(Long, Long)].collect().toMap
    assert(dist == alt)
  }

  test("adaptive CC local path leaves no persisted blocks behind") {
    val edges = Seq((1L, 2L), (2L, 3L), (9L, 9L)).toDF("a", "b")
    val before = spark.sparkContext.getPersistentRDDs.size
    val (labels, free) = ConnectedComponents.componentsAdaptiveReleasable(edges)
    assert(labels.as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    free()
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "local union-find must not retain its probe snapshot")
  }

  test("releasable variants free the result-backing snapshot blocks (ADVICE r5)") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    def persistedCount: Int = spark.sparkContext.getPersistentRDDs.size
    for (releasable <- Seq(
        ConnectedComponents.componentsReleasable(edges),
        ConnectedComponents.componentsAlternatingReleasable(edges))) {
      val (labels, free) = releasable
      val got = labels.as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
      val before = persistedCount
      assert(before > 0, "result should be snapshot-backed before release")
      free()
      assert(persistedCount < before,
        "the unpersist handle must actually free the backing snapshot")
    }
  }
}
