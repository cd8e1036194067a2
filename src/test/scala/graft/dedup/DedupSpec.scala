package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Planted-duplicate tests: the synthetic corpus is all-unique, so
  * every near-dup operator is exercised on rows we plant ourselves.
  */
class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away home"
  private val nearDup = "the quick brown fox jumps over the lazy dog and runs far away fast"
  private val distinct1 = "completely different text about spark query engines and shuffles everywhere"
  private lazy val docs = Seq(
    (1L, base), (2L, base), // exact dup pair
    (3L, nearDup), // near dup of 1/2
    (4L, distinct1)).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(g.contains((1L, 2L)))
    assert(g.size == 3)
    val kept = Dedup.dropExactDuplicates(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("minhash LSH surfaces exact + near dup pairs, not unrelated ones") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash signature of identical texts is identical") {
    val sig = Dedup.minhashSignature(docs, "doc_id", "text")
      .select("doc_id", "minhash").as[(Long, Seq[Long])].collect().toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(4L))
  }

  test("simhash: identical => distance 0; near-dup within 3+ chunks pigeonhole finds it") {
    val sh = Dedup.simhash(docs, "doc_id", "text")
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    assert(sh(1L) == sh(2L))
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L))
  }

  test("ngram jaccard: exact pair = 1.0, near pair high, unrelated absent") {
    val j = Dedup.ngramJaccardNearDups(docs, "doc_id", "text",
      threshold = 0.3)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    val m = j.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((1L, 2L)) == 1.0)
    assert(m.get((1L, 3L)).exists(v => v > 0.3 && v < 1.0))
    assert(!m.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("embedding near-dup finds planted identical vector via sign-bucket join") {
    val v1 = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    val v2 = v1.clone(); v2(15) = v2(15) + 0.001f
    val v3 = Array.tabulate(16)(i => math.cos(3 * i + 2).toFloat)
    val emb = Seq((1L, v1.toSeq), (2L, v2.toSeq), (3L, v3.toSeq))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDups(emb, "vec_id", "embedding",
      threshold = 0.999, signBits = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("semanticIncremental classifies a planted batch against the frozen corpus") {
    // corpus: 12 strictly-positive, well-separated vectors, two of
    // which (ids 5 and 9) are IDENTICAL — the lowest-match tiebreak
    // probe. Invariants chosen to be robust to the blocking layout:
    // an exact duplicate of a corpus vector always lands in the same
    // coarse cell / fine block / sign bucket as its original (the
    // assignment is a pure function of the vector), and an
    // all-negative vector has cosine < 0 to every corpus member, so
    // no candidate can verify regardless of blocking. tau = 0.999:
    // these all-positive vectors sit at pairwise cosines ~0.9, so a
    // loose tau would match everything — only exact copies clear 0.999.
    def basev(g: Int) =
      Array.tabulate(16)(i => (1.5 + math.sin(5.0 * g + 2 * i)).toFloat)
    val corpus = (0 until 12).map(g =>
      (g.toLong, (if (g == 9) basev(5) else basev(g)).toSeq))
      .toDF("vec_id", "embedding")
    val batch = Seq(
      (100L, basev(5).toSeq), // exact dup of ids 5 AND 9 -> dup_of = 5
      (101L, basev(7).toSeq), // exact dup of id 7
      (102L, basev(0).map(x => -x).toSeq) // negative: cos < 0 to all
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticIncremental(corpus, batch, "vec_id", "embedding",
      threshold = 0.999)
      .select($"vec_id", $"status", $"dup_of")
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(100L) == (("near_dup", Some(5L)))) // lowest of the two copies
    assert(out(101L) == (("near_dup", Some(7L))))
    assert(out(102L) == (("new", None)))
    // and the cosine carried is the match's exact cosine (1.0 here)
    val cos100 = Dedup.semanticIncremental(corpus, batch, "vec_id", "embedding",
      threshold = 0.999)
      .filter($"vec_id" === 100L).select("cosine").as[Double].head()
    assert(math.abs(cos100 - 1.0) < 1e-9)
  }

  test("clustered blocking (k-means cells + sign refinement) recalls every planted near-dup pair") {
    // 40 well-separated base vectors + a perturbed near-copy of each
    // (cosine >= 0.999) — recall proof for the scale-adaptive blocking:
    // the clustered candidate set must contain EVERY exact near-dup
    // edge, i.e. the verified pair set equals the all-pairs baseline.
    def basev(g: Int) =
      Array.tabulate(16)(i => (math.sin(7.0 * g + i) + math.cos(3.0 * g * i + 1)).toFloat)
    val rows = (0 until 40).flatMap { g =>
      val v = basev(g)
      val w = v.clone(); w(g % 16) = w(g % 16) + 0.0005f
      Seq((g.toLong * 2, v.toSeq), (g.toLong * 2 + 1, w.toSeq))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDupsExact(emb, "vec_id", "embedding",
      threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.size >= 40, s"planting failed: ${exact.size} exact pairs")
    val clustered = Dedup.embeddingNearDupsClustered(emb, "vec_id", "embedding",
      threshold = 0.999, k = 10, iters = 1, signBits = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(clustered == exact,
      s"missed ${(exact -- clustered).take(5)} extra ${(clustered -- exact).take(5)}")
  }

  test("hierarchical blocking recalls every planted near-dup pair") {
    // same planted corpus as the flat clustered test: the two-level
    // scheme (coarse √k cells → per-cell lowest-id representatives →
    // fine join-assignment) must also contain every exact near-dup
    // edge — near-identical vectors share coarse cell, representative
    // and sign pattern except on knife-edge argmin ties
    def basev(g: Int) =
      Array.tabulate(16)(i => (math.sin(7.0 * g + i) + math.cos(3.0 * g * i + 1)).toFloat)
    val rows = (0 until 40).flatMap { g =>
      val v = basev(g)
      val w = v.clone(); w(g % 16) = w(g % 16) + 0.0005f
      Seq((g.toLong * 2, v.toSeq), (g.toLong * 2 + 1, w.toSeq))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDupsExact(emb, "vec_id", "embedding",
      threshold = 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // small blockSize so the 80-vector corpus actually exercises the
    // two levels (k = 80/8 = 10, k1 = 4, multiple reps per cell)
    val hier = Dedup.embeddingNearDupsHier(emb, "vec_id", "embedding",
      threshold = 0.999, blockSize = 8, signBits = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(hier == exact,
      s"missed ${(exact -- hier).take(5)} extra ${(hier -- exact).take(5)}")
  }

  test("dropNearDuplicates resolves transitive clusters to one representative") {
    val chain = Seq(
      (1L, base),
      (2L, base), // exact dup of 1
      (3L, nearDup), // near 1/2 => same cluster transitively
      (4L, distinct1)).toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicates(chain, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
  }

  test("native kernels are bit-identical to the relational formulations") {
    val d = graft.Tables.documents(spark, sf).limit(200)
    val k = Dedup.simhash(d, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val r = Dedup.simhashRelational(d, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(k == r)
    val km = Dedup.minhashSignature(d, "doc_id", "text", shingleK = 5)
      .as[(Long, Seq[Long])].collect().toMap
    val rm = Dedup.minhashSignatureRelational(d, "doc_id", "text", shingleK = 5)
      .as[(Long, Seq[Long])].collect().toMap
    assert(km == rm)
    val ks = d.select($"doc_id", graft.functions.HashExprs.shingles($"text", 5))
      .as[(Long, Seq[String])].collect().toMap
    val rs = d.select($"doc_id",
      graft.functions.TextOps.shingles(graft.functions.TextOps.tokenize($"text"), 5))
      .as[(Long, Seq[String])].collect().toMap
    assert(ks == rs)
  }

  test("simhash60 md5 kernel matches a relational md5-hex formulation") {
    val d = graft.Tables.documents(spark, sf).limit(100)
    val k = Dedup.simhash60(d, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    // relational restatement: explode tokens, token hash = first 15
    // hex chars of md5 (conv base16), 60 partial ±1 votes
    val toks = d.select($"doc_id",
      explode(split($"text", " ")).as("tok"))
      .withColumn("h", expr("cast(conv(substring(md5(tok), 1, 15), 16, 10) as bigint)"))
    val aggs = (0 until 60).map(i =>
      sum(when(shiftrightunsigned($"h", i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$i"))
    val votes = toks.groupBy($"doc_id").agg(aggs.head, aggs.tail: _*)
    val r = votes.select($"doc_id",
      (0 until 60).map(i =>
        when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L))
        .reduce((x, y) => x.bitwiseOR(y)).as("simhash"))
      .as[(Long, Long)].collect().toMap
    assert(k == r)
    // signatures are 60-bit non-negative (portable BIGINT both engines)
    assert(k.values.forall(v => v >= 0L && v < (1L << 60)))
  }

  test("runs on the real corpus without error (all-unique => no exact dups)") {
    val d = graft.Tables.documents(spark, sf)
    assert(Dedup.exactGroups(d, "doc_id", "text")
      .filter(col("n_copies") > 1).count() == 0)
  }

  test("containment catches a sub-document that jaccard dilutes") {
    // doc 2 = doc 1's text embedded in a much larger document: the
    // symmetric jaccard is diluted by the host's size, but containment
    // of 1-in-2 is ~1.0 — the asymmetric signal is the operator's point
    val host = base + " " + distinct1 + " " + Seq.tabulate(40)(i => s"filler$i word$i").mkString(" ")
    val docs2 = Seq((1L, base), (2L, host), (3L, distinct1 + " unrelated tail here"))
      .toDF("doc_id", "text")
    val cont = Dedup.ngramContainment(docs2, "doc_id", "text",
      threshold = 0.9, shingleK = 5, maxDocFreq = 100)
      .select("id_a", "id_b", "cont_a_in_b", "cont_b_in_a")
      .as[(Long, Long, Double, Double)].collect()
    val pair = cont.find(p => p._1 == 1L && p._2 == 2L)
    assert(pair.isDefined, s"1-in-2 containment not found: ${cont.toSeq}")
    assert(pair.get._3 == 1.0) // every shingle of 1 appears in 2
    assert(pair.get._4 < 0.5) // host is NOT contained in the fragment
    // while jaccard at the same threshold misses the pair entirely
    val jac = Dedup.ngramJaccardNearDups(docs2, "doc_id", "text",
      threshold = 0.9, shingleK = 5, maxDocFreq = 100).collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
  }

  test("semantic dedup resolves transitive embedding chains to one representative") {
    // v1~v2 (cos .8) and v2~v3 (cos .68) but v1!~v3 (cos .1): pairwise
    // pruning alone would keep v3; components must collapse the chain
    // to min-id v1. v4 shares the sign bucket but matches nothing.
    val emb = Seq(
      (1L, Seq(1.0f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), 10),
      (2L, Seq(0.8f, 0.6f, 0f, 0f, 0f, 0f, 0f, 0f), 20),
      (3L, Seq(0.1f, 0.995f, 0f, 0f, 0f, 0f, 0f, 0f), 30),
      (4L, Seq(0f, 0f, 0f, 0f, 0f, 0f, 1f, 0f), 40)
    ).toDF("vec_id", "embedding", "label")
    val edges = Dedup.embeddingNearDups(emb, "vec_id", "embedding",
      threshold = 0.35, signBits = 6)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    val survivors = graft.dedup.ConnectedComponents
      .representatives(emb, "vec_id", edges)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors == Set(1L, 4L), s"got $survivors")
  }

  test("lsh-covers-exact: 16x2 candidates superset every exact-Jaccard >= 0.5 pair (graded corpus)") {
    // qDedupDrop's oracle equivalence assumes 16x2-band LSH recall is
    // literally complete at threshold 0.5 on this corpus (per-pair
    // collision probability at jaccard exactly 0.5 is ~0.990, so the
    // assumption is empirical — ADVICE r5). This asserts it on the
    // corpus the driver actually grades (sf0.01 when present): every
    // pair at exact Jaccard >= 0.5 must appear among the LSH
    // candidates. Exact pairs are generated the oracle's own way —
    // shared-shingle inverted index (a >= 0.5 pair shares shingles by
    // definition), then exact Jaccard.
    val dir = if (new java.io.File("/root/testdata/sf0.01").isDirectory)
      "/root/testdata/sf0.01" else sf
    val d = graft.Tables.documents(spark, dir)
    val inv = d.select($"doc_id", explode(array_distinct(
      graft.functions.TextOps.shingles(
        graft.functions.TextOps.tokenize($"text"), 5))).as("sh"))
    val cand = inv.as("a").join(inv.as("b"), Seq("sh"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b")).distinct()
    val exact = Dedup.withJaccard(cand, d, "doc_id", "text", shingleK = 5)
      .filter($"jaccard" >= 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashCandidates(d, "doc_id", "text",
      shingleK = 5, bands = 16, rowsPerBand = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "corpus should contain at least one >=0.5 pair")
    assert(exact.subsetOf(lsh),
      s"LSH candidates missed exact pairs: ${exact.diff(lsh).take(5)}")
  }

  test("minhashIncremental classifies a planted batch against the corpus") {
    val corpus = Seq((1L, base), (3L, nearDup), (4L, distinct1))
      .toDF("doc_id", "text")
    val batch = Seq(
      (100L, base), // exact copy of 1, near-dup of 3 -> lowest match 1
      (101L, "totally unrelated words about gardening tulips roses daisies sunflowers blooming"),
      (102L, "too short") // < k tokens: no signature -> new
    ).toDF("doc_id", "text")
    val out = Dedup.minhashIncremental(corpus, batch, "doc_id", "text",
      threshold = 0.5)
      .select($"doc_id", $"status", $"dup_of", $"jaccard")
      .as[(Long, String, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(100L)._1 == "near_dup" && out(100L)._2 == Some(1L))
    assert(out(100L)._3 == Some(1.0)) // carried jaccard is the MATCH's, exact copy = 1.0
    assert(out(101L) == (("new", None, None)))
    assert(out(102L) == (("new", None, None)))
  }

  test("minhashIncremental equals the exact batch-by-corpus Jaccard classification") {
    // overlapping-vocab synthetic corpus (17 word types, 12-word
    // docs): plenty of cross-doc shingle collisions, several >= 0.5
    // pairs. 16x2 bands at threshold 0.5 — the complete-recall shape —
    // so the LSH-candidates-then-verify classify must EQUAL the
    // all-pairs exact classify (same argument as qDedupDrop's oracle,
    // restricted to batch x corpus pairs).
    val texts = (0 until 24).map { g =>
      (g.toLong, (0 until 12).map(w => s"w${(g * 5 + w * 3) % 17}").mkString(" "))
    }
    val docs = texts.toDF("doc_id", "text")
    val corpus = docs.filter($"doc_id" % 3 =!= 0)
    val batch = docs.filter($"doc_id" % 3 === 0)
    val got = Dedup.minhashIncremental(corpus, batch, "doc_id", "text",
      threshold = 0.5, shingleK = 3, bands = 16, rowsPerBand = 2)
      .select($"doc_id", $"dup_of")
      .as[(Long, Option[Long])].collect().toMap
    val pairs = batch.select($"doc_id".as("id_a"))
      .crossJoin(corpus.select($"doc_id".as("id_b")))
    val exact = Dedup.withJaccard(pairs, docs, "doc_id", "text", shingleK = 3)
      .filter($"jaccard" >= 0.5)
      .groupBy($"id_a").agg(min($"id_b").as("dup_of"))
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == batch.select("doc_id").as[Long].collect().toSet)
    got.foreach { case (bid, dup) =>
      assert(dup == exact.get(bid), s"doc $bid: got $dup expected ${exact.get(bid)}")
    }
    assert(exact.nonEmpty, "planting failed: no >= 0.5 batch-corpus pair")
  }
}
