package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.tools.{Artifacts, Scratch}

class LabelStoreSpec extends SparkTestBase {
  import spark.implicits._

  private def scratch(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toAbsolutePath.toString

  private def edgesDf(pairs: Seq[(Long, Long)]): DataFrame =
    pairs.toDF("a", "b")

  private def labelSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("id").cast("long"), col("component").cast("long"))
      .as[(Long, Long)].collect().toSet

  test("save/load round-trips; loadBuckets prunes to the named buckets") {
    val root = scratch("labelstore_rt")
    try {
      val labels = Seq((1L, 1L), (2L, 1L), (5L, 5L), (9L, 5L), (7L, 7L))
        .toDF("id", "component")
      LabelStore.save(labels, root, nBuckets = 4)
      assert(labelSet(LabelStore.load(spark, root)) ==
        Set((1L, 1L), (2L, 1L), (5L, 5L), (9L, 5L), (7L, 7L)))
      assert(LabelStore.nBucketsOf(spark, root) == 4)
      // components 1 and 5 both hash to bucket 1 (mod 4); 7 → bucket 3
      assert(labelSet(LabelStore.loadBuckets(spark, root, Set(1))) ==
        Set((1L, 1L), (2L, 1L), (5L, 5L), (9L, 5L)))
      assert(labelSet(LabelStore.loadBuckets(spark, root, Set(3))) ==
        Set((7L, 7L)))
      assert(LabelStore.manifest(spark, root).keySet == Set(1, 3))
    } finally Scratch.deleteRecursively(new java.io.File(root))
  }

  test("appendEdges ≡ in-memory appendEdges ≡ full recompute (random + chain + new nodes)") {
    val rnd = new scala.util.Random(42)
    val base = Seq.fill(160)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(p => p._1 != p._2)
    // delta merges existing components, introduces new ids 100-120,
    // and contains a chain bridging two regions
    val delta = Seq.fill(40)((rnd.nextInt(80).toLong, (100 + rnd.nextInt(20)).toLong))
      .filter(p => p._1 != p._2) ++ (0L until 10L).map(i => (i * 7, i * 7 + 7))
    val root = scratch("labelstore_delta")
    try {
      val baseLabels = ConnectedComponents.componentsAdaptive(edgesDf(base))
      LabelStore.save(baseLabels, root, nBuckets = 8)
      LabelStore.appendEdges(spark, root, edgesDf(delta))
      val viaStore = labelSet(LabelStore.load(spark, root))
      val viaMem = labelSet(
        ConnectedComponents.appendEdges(baseLabels, edgesDf(delta)))
      val viaFull = labelSet(
        ConnectedComponents.componentsAdaptive(edgesDf(base ++ delta)))
      assert(viaStore == viaFull, "store delta != full recompute")
      assert(viaMem == viaFull, "in-memory delta != full recompute")
    } finally Scratch.deleteRecursively(new java.io.File(root))
  }

  test("touched-bucket-only writes: untouched buckets pass through by reference, files untouched") {
    val root = scratch("labelstore_touch")
    try {
      // 16 singleton components 0..15 over 16 buckets: component i in
      // bucket i — surgical control of which buckets a delta touches
      val labels = (0L until 16L).map(i => (i, i)).toDF("id", "component")
      LabelStore.save(labels, root, nBuckets = 16)
      val before = LabelStore.manifest(spark, root)
      assert(before.keySet == (0 until 16).toSet)
      val filesBefore = before.map { case (b, d) =>
        b -> Scratch.listParquetFiles(d)
      }
      // delta merges components 5 and 9 (touches buckets 5 and 9) and
      // adds new node 21 linked to 5 (bucket 5 arrival)
      LabelStore.appendEdges(spark, root, edgesDf(Seq((5L, 9L), (21L, 5L))))
      val after = LabelStore.manifest(spark, root)
      // untouched buckets: SAME dir string, SAME files, SAME sizes
      (0 until 16).filter(b => b != 5 && b != 9).foreach { b =>
        assert(after(b) == before(b), s"bucket $b dir changed")
        assert(Scratch.listParquetFiles(after(b)) == filesBefore(b),
          s"bucket $b files changed")
      }
      // bucket 9 emptied (its component merged into 5's bucket)
      assert(!after.contains(9))
      assert(after(5) != before(5), "touched bucket must be rewritten")
      assert(labelSet(LabelStore.loadBuckets(spark, root, Set(5))) ==
        Set((5L, 5L), (9L, 5L), (21L, 5L)))
      // and the whole table is the full-recompute answer
      assert(labelSet(LabelStore.load(spark, root)) ==
        (0L until 16L).map(i => (i, if (i == 9) 5L else i)).toSet +
          ((21L, 5L)))
    } finally Scratch.deleteRecursively(new java.io.File(root))
  }

  test("idempotent replay; empty delta publishes nothing; pool holds only referenced dirs") {
    val root = scratch("labelstore_replay")
    try {
      LabelStore.save(
        Seq((0L, 0L), (1L, 0L), (4L, 4L)).toDF("id", "component"),
        root, nBuckets = 4)
      val delta = edgesDf(Seq((1L, 4L)))
      LabelStore.appendEdges(spark, root, delta)
      val once = labelSet(LabelStore.load(spark, root))
      assert(once == Set((0L, 0L), (1L, 0L), (4L, 0L)))
      // replay (at-least-once stream semantics): same edges again
      LabelStore.appendEdges(spark, root, delta)
      assert(labelSet(LabelStore.load(spark, root)) == once)
      // empty delta: no new generation
      val genBefore = Artifacts.requireGen(spark, root)
      LabelStore.appendEdges(spark, root, edgesDf(Nil))
      assert(Artifacts.requireGen(spark, root) == genBefore)
      // pool prune: every surviving pool dir is referenced by a
      // committed generation, and every referenced dir survives
      val referenced = Artifacts.committedGens(spark, root)
        .flatMap { g =>
          // manifest() reads the CURRENT gen; read each gen directly
          LabelStore.manifestOfGen(spark, g).values
        }
        .map(d => d.split("/pool/").last.split("/").head).toSet
      val poolDirs = new java.io.File(s"$root/pool").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(poolDirs == referenced,
        s"pool $poolDirs != referenced $referenced")
    } finally Scratch.deleteRecursively(new java.io.File(root))
  }

  test("lookup pushdown gate: results identical through the literal and semi-join paths") {
    val root1 = scratch("labelstore_lit")
    val root2 = scratch("labelstore_semi")
    try {
      val labels = (0L until 50L).map(i => (i, i / 5 * 5)).toDF("id", "component")
      val delta = edgesDf(Seq((2L, 27L), (44L, 60L)))
      LabelStore.save(labels, root1, nBuckets = 8)
      LabelStore.save(labels, root2, nBuckets = 8)
      LabelStore.appendEdges(spark, root1, delta) // literal isin path
      LabelStore.appendEdges(spark, root2, delta, maxLiteralLookup = 0) // semi join path
      assert(labelSet(LabelStore.load(spark, root1)) ==
        labelSet(LabelStore.load(spark, root2)))
    } finally {
      Scratch.deleteRecursively(new java.io.File(root1))
      Scratch.deleteRecursively(new java.io.File(root2))
    }
  }

  test("rebucket: identity on labels, new width live for maintenance, atomic to readers (VERDICT r13 #5)") {
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(200)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
      .filter(p => p._1 != p._2)
    val delta = Seq.fill(30)((rnd.nextInt(100).toLong, (200 + rnd.nextInt(10)).toLong))
    val root = scratch("labelstore_rebucket")
    try {
      LabelStore.save(
        ConnectedComponents.componentsAdaptive(edgesDf(base)), root,
        nBuckets = 4)
      val before = labelSet(LabelStore.load(spark, root))
      val genBefore = Artifacts.requireGen(spark, root)
      LabelStore.rebucket(spark, root, 32)
      // identity on labels; width migrated; one new committed gen
      assert(labelSet(LabelStore.load(spark, root)) == before)
      assert(LabelStore.nBucketsOf(spark, root) == 32)
      assert(LabelStore.manifest(spark, root).keySet.forall(_ < 32))
      assert(Artifacts.requireGen(spark, root) != genBefore)
      // maintenance after the migration banks on the new width and
      // still equals the full recompute
      LabelStore.appendEdges(spark, root, edgesDf(delta))
      assert(labelSet(LabelStore.load(spark, root)) ==
        labelSet(ConnectedComponents.componentsAdaptive(
          edgesDf(base ++ delta))))
    } finally Scratch.deleteRecursively(new java.io.File(root))
  }

  test("bucketBytes observable: one row per manifest bucket, bytes match the files, mean drives the cadence") {
    val root = scratch("labelstore_bytes")
    try {
      val labels = (0L until 400L).map(i => (i, i % 37)).toDF("id", "component")
      LabelStore.save(labels, root, nBuckets = 8)
      val man = LabelStore.manifest(spark, root)
      val rows = LabelStore.bucketBytes(spark, root)
        .as[(Int, Long, Int)].collect().toSeq
      assert(rows.map(_._1).toSet == man.keySet,
        "observable must cover exactly the manifest's buckets")
      assert(rows.forall(r => r._2 > 0 && r._3 > 0))
      // bytes are the real parquet footprint of each bucket dir
      rows.foreach { case (b, bytes, _) =>
        val local = graft.tools.Artifacts.localPath(man(b))
        val want = graft.tools.Scratch.listParquetFiles(local).values.sum
        assert(bytes == want, s"bucket $b bytes $bytes != on-disk $want")
      }
      val mean = LabelStore.meanBucketBytes(spark, root)
      assert(mean > 0 && mean == rows.map(_._2).sum.toDouble / rows.size)
      // the cadence contract end-to-end: rebucket to 4x the width
      // drops the mean ~4x (same bytes, more buckets)
      LabelStore.rebucket(spark, root, 32)
      val meanAfter = LabelStore.meanBucketBytes(spark, root)
      assert(meanAfter < mean,
        s"rebucket to 4x buckets did not shrink mean bucket bytes ($mean -> $meanAfter)")
    } finally Scratch.deleteRecursively(new java.io.File(root))
  }
}
