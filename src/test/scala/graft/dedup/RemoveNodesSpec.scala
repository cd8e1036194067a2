package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.tools.Scratch

class RemoveNodesSpec extends SparkTestBase {
  import spark.implicits._

  private def edgesDf(pairs: Seq[(Long, Long)]): DataFrame =
    pairs.toDF("a", "b")

  private def labelSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("id").cast("long"), col("component").cast("long"))
      .as[(Long, Long)].collect().toSet

  /** Ground truth after deleting `del` from the graph `edges`: CC over
    * the surviving edges, plus singletons for surviving nodes that
    * lost every edge. (CC labels cover only edge-having nodes.)
    */
  private def fullRecompute(edges: Seq[(Long, Long)],
      del: Set[Long]): Set[(Long, Long)] = {
    val surviving = edges.filter(e => !del(e._1) && !del(e._2))
    val withEdges =
      if (surviving.isEmpty) Set.empty[(Long, Long)]
      else labelSet(ConnectedComponents.componentsAdaptive(edgesDf(surviving)))
    val allNodes = edges.flatMap(e => Seq(e._1, e._2)).toSet -- del
    val edgeHaving = withEdges.map(_._1)
    withEdges ++ (allNodes -- edgeHaving).map(i => (i, i))
  }

  test("random graph: removeNodes ≡ full recompute, including splits") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(200)(
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(p => p._1 != p._2).distinct
    val labels = ConnectedComponents.componentsAdaptive(edgesDf(edges))
    val del = Set(3L, 17L, 30L, 55L)
    val got = labelSet(ConnectedComponents.removeNodes(
      labels, edgesDf(edges), del.toSeq.toDF("id")))
    assert(got == fullRecompute(edges, del))
    assert(got.forall { case (id, c) => !del(id) && !del(c) })
  }

  test("cut vertex: deleting it splits the chain; deleting the min moves the label") {
    val chain = (0L until 10L).map(i => (i, i + 1))
    val labels = ConnectedComponents.componentsAdaptive(edgesDf(chain))
    // delete 5: {0..4} keeps label 0, {6..10} re-roots at 6
    val split = labelSet(ConnectedComponents.removeNodes(
      labels, edgesDf(chain), Seq(5L).toDF("id")))
    assert(split == fullRecompute(chain, Set(5L)))
    assert(split.filter(_._1 >= 6L).forall(_._2 == 6L))
    assert(split.filter(_._1 <= 4L).forall(_._2 == 0L))
    // delete 0 (the component min): the label must move to 1
    val reroot = labelSet(ConnectedComponents.removeNodes(
      labels, edgesDf(chain), Seq(0L).toDF("id")))
    assert(reroot == fullRecompute(chain, Set(0L)))
    assert(reroot.forall(_._2 == 1L))
  }

  test("edge cases: whole component deleted; unknown ids; empty ids; untouched pass-through") {
    val edges = Seq((0L, 1L), (1L, 2L), (10L, 11L), (20L, 21L))
    val labels = ConnectedComponents.componentsAdaptive(edgesDf(edges))
    // whole component {0,1,2} deleted; {10,11} and {20,21} untouched
    val gone = labelSet(ConnectedComponents.removeNodes(
      labels, edgesDf(edges), Seq(0L, 1L, 2L).toDF("id")))
    assert(gone == Set((10L, 10L), (11L, 10L), (20L, 20L), (21L, 20L)))
    // ids not in the graph: full pass-through
    val noop = labelSet(ConnectedComponents.removeNodes(
      labels, edgesDf(edges), Seq(99L).toDF("id")))
    assert(noop == labelSet(labels))
    // empty ids: full pass-through
    val empty = labelSet(ConnectedComponents.removeNodes(
      labels, edgesDf(edges), Seq.empty[Long].toDF("id")))
    assert(empty == labelSet(labels))
  }

  test("LabelStore.removeIds: ≡ removeNodes, touched-bucket-only writes, ids never reappear") {
    val root = scratchDir("labelstore_remove")
    try {
      // components 0..15 as 16 two-node stars (i, i+100): component i
      // lands in bucket i of 16 — surgical bucket control
      val edges = (0L until 16L).map(i => (i, i + 100L))
      val labels = ConnectedComponents.componentsAdaptive(edgesDf(edges))
      LabelStore.save(labels, root, nBuckets = 16)
      val before = LabelStore.manifest(spark, root)
      val filesBefore = before.map { case (b, d) =>
        b -> Scratch.listParquetFiles(d)
      }
      // delete node 7 (component 7's min: label must move to 107,
      // bucket 107 % 16 = 11 — an ARRIVAL in an untouched-so-far bucket)
      LabelStore.removeIds(spark, root, Seq(7L).toDF("id"), edgesDf(edges))
      val got = labelSet(LabelStore.load(spark, root))
      val expected = labelSet(ConnectedComponents.removeNodes(
        labels, edgesDf(edges), Seq(7L).toDF("id")))
      assert(got == expected)
      assert(got == fullRecompute(edges, Set(7L)))
      assert(!got.exists(_._1 == 7L), "tombstoned id reappeared")
      val after = LabelStore.manifest(spark, root)
      // buckets 7 (old component) and 11 (new label 107) rewritten;
      // everything else passes through by reference
      (0 until 16).filter(b => b != 7 && b != 11).foreach { b =>
        assert(after(b) == before(b), s"bucket $b dir changed")
        assert(Scratch.listParquetFiles(after(b)) == filesBefore(b),
          s"bucket $b files changed")
      }
      assert(!after.contains(7) || after(7) != before(7))
      // bucket 11 = component 11's rows plus the arrived singleton
      assert(labelSet(LabelStore.loadBuckets(spark, root, Set(11))) ==
        Set((11L, 11L), (111L, 11L), (107L, 107L)))
      // maintenance composes: a later append re-admits the id only via
      // genuinely new edges
      LabelStore.appendEdges(spark, root, edgesDf(Seq((7L, 107L))))
      assert(labelSet(LabelStore.load(spark, root)).contains((7L, 7L)))
    } finally Scratch.deleteRecursively(new java.io.File(root))
  }

  private def scratchDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toAbsolutePath.toString
}
