package graft.similarity

import graft.SparkTestBase

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    dot / (na * nb)
  }

  test("brute-force top-k matches a driver-side brute force on the real table") {
    val emb = graft.Tables.embeddings(spark, sf)
    val all = emb.select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val q = all.find(_._1 == 0L).get._2
    val expected = all.map { case (id, v) => (id, cosine(v, q)) }
      .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSeq
    val got = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(got == expected)
  }

  test("postings top-k is bit-identical to brute force, incl zero and no-overlap vectors") {
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" === 0).select("embedding").as[Seq[Float]].head()
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      .as[(Long, Double)].collect().toSeq
    val inv = Similarity.postingsTopK(emb, "vec_id", "embedding", q, 10)
      .as[(Long, Double)].collect().toSeq
    assert(inv == brute) // EXACT doubles — the fold-order argument, not an epsilon
    // sparse edge cases: zero vector (null cosine, sorts last) and a
    // nonzero vector sharing NO nonzero position with the query
    // (left-join miss: dot exactly 0.0, not absent)
    val q2 = Seq(1f, 0f, 2f, 0f)
    val sparse = Seq(
      (0L, q2),
      (1L, Seq(0f, 0f, 0f, 0f)),
      (2L, Seq(0f, 3f, 0f, 4f)),
      (3L, Seq(0.5f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val b2 = Similarity.bruteForceTopK(sparse, "vec_id", "embedding", q2, 4)
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    val i2 = Similarity.postingsTopK(sparse, "vec_id", "embedding", q2, 4)
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    assert(i2 == b2)
    assert(i2.map(_._1) == Seq(0L, 3L, 2L, 1L)) // colinear ties by id, 0-cos, null last
    assert(i2(2)._2.contains(0.0)) // no-overlap doc: cosine exactly 0.0
    assert(i2.last._2.isEmpty) // zero vector: null cosine, last
    // malformed rows (ADVICE r5): a length-mismatched vector and one
    // containing a null element must get null cosine on BOTH paths —
    // the postings layout would otherwise silently score them on the
    // overlapping nonzero positions
    val malformed = Seq(
      (0L, Seq[java.lang.Float](1f, 0f, 2f, 0f)),
      (1L, Seq[java.lang.Float](1f, 0f, 2f)), // shorter than the query
      (2L, Seq[java.lang.Float](1f, null, 2f, 0f)), // null element
      (3L, Seq[java.lang.Float](0.5f, 0f, 1f, 0f, 0f))) // longer
      .toDF("vec_id", "embedding")
    val b3 = Similarity.bruteForceTopK(malformed, "vec_id", "embedding", q2, 4)
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    val i3 = Similarity.postingsTopK(malformed, "vec_id", "embedding", q2, 4)
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    assert(i3 == b3)
    assert(i3.count(_._2.isEmpty) == 3) // all three malformed rows null out
  }

  test("postings top-k broadcasts the query positions and heaps the top-k") {
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" === 0).select("embedding").as[Seq[Float]].head()
    val p = Similarity.postingsTopK(emb, "vec_id", "embedding", q, 10)
      .queryExecution.executedPlan.toString
    // the ≤query-nnz position table must broadcast into the postings
    // stream — a shuffled join here repartitions the whole postings
    // relation by pos at corpus scale
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("CartesianProduct"))
    // final ranking is a per-partition heap + k-row merge, never a
    // global sort of all docs
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
  }

  test("bucketed top-k returns the query vector itself first (same bucket by construction)") {
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" === 0).select("embedding")
      .as[Seq[Float]].head()
    val got = Similarity.bucketedTopK(emb, "vec_id", "embedding", q, 5)
      .select("vec_id", "cosine").as[(Long, Double)].collect()
    assert(got.head._1 == 0L)
    assert(math.abs(got.head._2 - 1.0) < 1e-9)
    // approximate: results are a subset of the corpus, scored correctly
    assert(got.map(_._2).toSeq == got.map(_._2).toSeq.sorted.reverse)
  }

  test("ivf top-k: deterministic, finds the query itself, recall@10 >= 0.8 at nProbe=8") {
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" === 0).select("embedding").as[Seq[Float]].head()
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", q, 10,
      nCentroids = 16, nProbe = 8, iters = 2)
      .select("vec_id", "cosine").as[(Long, Double)].collect()
    assert(ivf.head._1 == 0L && math.abs(ivf.head._2 - 1.0) < 1e-9)
    assert(ivf.map(_._2).toSeq == ivf.map(_._2).toSeq.sorted.reverse)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect().toSet
    // the q_sim_ivf driver gate enforces the same bound — keep in sync
    val recall = ivf.map(_._1).count(brute.contains)
    assert(recall >= 8, s"ivf recall@10 too low: $recall (want >= 8 at nProbe=8/16)")
    // determinism: a second run returns identical rows
    val again = Similarity.ivfTopK(emb, "vec_id", "embedding", q, 10,
      nCentroids = 16, nProbe = 8, iters = 2)
      .select("vec_id", "cosine").as[(Long, Double)].collect()
    assert(ivf.toSeq == again.toSeq)
  }

  test("mrl top-k: full candidate budget degenerates to exact; tight budget still finds the query") {
    val emb = graft.Tables.embeddings(spark, sf)
    val n = emb.count().toInt
    val q = emb.filter($"vec_id" === 0).select("embedding").as[Seq[Float]].head()
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      .as[(Long, Double)].collect().toSeq
    // c = n keeps every vector through the prefix cut — the re-rank
    // IS the brute force, so the result must be identical (exact
    // doubles: same kernel, same fold)
    val full = Similarity.mrlTopK(emb, "vec_id", "embedding", q, k = 10,
      prefixDim = 16, c = n)
      .as[(Long, Double)].collect().toSeq
    assert(full == brute)
    // the query's own prefix cosine with itself is 1.0 — the maximum —
    // so it survives ANY candidate budget and re-ranks first at
    // full-dim cosine 1.0
    val tight = Similarity.mrlTopK(emb, "vec_id", "embedding", q, k = 3,
      prefixDim = 16, c = 5).as[(Long, Double)].collect()
    assert(tight.head._1 == 0L && math.abs(tight.head._2 - 1.0) < 1e-9)
  }

  test("mrl top-k is exact when the prefix carries all the signal (planted MRL-style vectors)") {
    // unit-norm prefixes + an IDENTICAL tail across the corpus: both
    // the prefix cosine and the full cosine are then monotone in the
    // same prefix dot product, so even a minimal candidate budget
    // (c = k) must reproduce the exact top-k — the property MRL
    // training buys on real models (prefix norms must be constant:
    // with varying prefix norms the two rankings can legitimately
    // diverge, which is exactly why the production query carries a
    // recall gate instead of an equality assumption)
    val tail = Array.tabulate(16)(i => 0.25f * ((i % 3) + 1))
    def v(g: Int) = {
      val raw = Array.tabulate(16)(i => math.sin(3.0 * g + 1.7 * i))
      val n = math.sqrt(raw.map(x => x * x).sum)
      (raw.map(x => (x / n).toFloat) ++ tail).toSeq
    }
    val emb = (0 until 50).map(g => (g.toLong, v(g)))
      .toDF("vec_id", "embedding")
    val q = v(7).map(_.toFloat)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 5)
      .select("vec_id").as[Long].collect().toSeq
    val mrl = Similarity.mrlTopK(emb, "vec_id", "embedding", q, k = 5,
      prefixDim = 16, c = 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(mrl == brute)
  }

  test("probeHamming=2 probes two-bit-flip buckets (regression: was capped at 1)") {
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" === 0).select("embedding").as[Seq[Float]].head()
    // flip the query's first two sign components => a vector in a
    // Hamming-2 bucket with high cosine to the rest of the dims
    val flipped = q.zipWithIndex.map { case (x, i) => if (i < 2) -x else x }
    val planted = Seq((9999L, flipped)).toDF("vec_id", "embedding")
    val corpus = emb.select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      .unionByName(planted)
    val h1 = Similarity.bucketedTopK(corpus, "vec_id", "embedding", q, 500,
      signBits = 8, probeHamming = 1).select("vec_id").as[Long].collect().toSet
    val h2 = Similarity.bucketedTopK(corpus, "vec_id", "embedding", q, 500,
      signBits = 8, probeHamming = 2).select("vec_id").as[Long].collect().toSet
    assert(!h1.contains(9999L) && h2.contains(9999L))
  }

  test("batch top-k produces k rows per query with correct ranking") {
    val emb = graft.Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id".isin(0L, 1L, 2L))
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val got = Similarity.batchTopK(emb, "vec_id", "embedding", queries, "qid", "qv", 3)
    val counts = got.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(counts == Map(0L -> 3L, 1L -> 3L, 2L -> 3L))
    // self-similarity tops each group
    val tops = got.filter("cosine > 0.999999").select("query_id", "vec_id")
      .as[(Long, Long)].collect().toSet
    assert(tops == Set((0L, 0L), (1L, 1L), (2L, 2L)))
  }
}
