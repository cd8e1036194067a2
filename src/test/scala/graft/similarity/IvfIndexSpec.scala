package graft.similarity

import graft.SparkTestBase

class IvfIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("ivf_index").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("build+save+load+topK equals the per-call ivfTopK exactly") {
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" === 0).select("embedding").as[Seq[Float]].head()

    val perCall = Similarity.ivfTopK(emb, "vec_id", "embedding", q,
      k = 10, nCentroids = 16, nProbe = 4, iters = 2)
      .as[(Long, Double)].collect().toSeq

    val idx = IvfIndex.build(emb, "vec_id", "embedding", nCentroids = 16, iters = 2)
    val path = tmpDir()
    IvfIndex.save(idx, path)
    val loaded = IvfIndex.load(spark, path, "vec_id", "embedding")

    // same training (shared trainCentroids) ⇒ identical centroids
    assert(loaded.centroids.length == idx.centroids.length)
    loaded.centroids.zip(idx.centroids).foreach { case (a, b) =>
      assert(a.sameElements(b))
    }
    val viaIndex = IvfIndex.topK(loaded, q, k = 10, nProbe = 4)
      .as[(Long, Double)].collect().toSeq
    assert(viaIndex == perCall)
  }

  test("loaded index prunes non-probed cells at the SCAN (PartitionFilters)") {
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" === 1).select("embedding").as[Seq[Float]].head()
    val path = tmpDir()
    IvfIndex.save(
      IvfIndex.build(emb, "vec_id", "embedding", nCentroids = 8, iters = 1), path)
    val loaded = IvfIndex.load(spark, path, "vec_id", "embedding")
    val plan = IvfIndex.topK(loaded, q, k = 5, nProbe = 2)
      .queryExecution.executedPlan.toString
    // the cell cut must reach the file source as a partition filter —
    // reading 2 of 8 directories is the IVF scan saving
    assert(plan.contains("PartitionFilters: [") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("cell"),
      s"cell predicate did not become a partition filter:\n$plan")
    // and the directory layout really is one dir per cell
    val dirs = new java.io.File(s"$path/corpus").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
    assert(dirs.length > 2, s"expected cell= partition dirs, got ${dirs.toSeq}")
  }

  test("fresh (unsaved) index serves the same ranks as the brute force on probed cells") {
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" === 2).select("embedding").as[Seq[Float]].head()
    val idx = IvfIndex.build(emb, "vec_id", "embedding", nCentroids = 8, iters = 1)
    val got = IvfIndex.topK(idx, q, k = 10, nProbe = 8) // probe ALL cells
      .select("vec_id").as[Long].collect().toSeq
    idx.unpersist() // never saved ⇒ caller releases the training cache
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == brute) // probing every cell ⇒ exact
  }
}
