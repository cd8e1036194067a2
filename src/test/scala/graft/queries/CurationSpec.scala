package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.Dedup
import graft.similarity.Similarity

/** Planted-case tests for the round-7 curation operators: rolling
  * substring dedup, the oracle-parity k-means, and the retrieval
  * metrics query's fixed-point invariants.
  */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  // a 20-token passage shared by docs 1 and 2 at different offsets;
  // doc 3 is unrelated; doc 4 is shorter than the window; doc 5 IS a
  // 16-token slice of the passage (fully duplicated text); doc 6
  // repeats its own private passage twice (within-doc only)
  private val passage = words("shared", 20)
  private val privatePassage = words("solo", 16)
  private lazy val docs = Seq(
    (1L, words("apre", 8) + " " + passage + " " + words("atail", 5)),
    (2L, words("bpre", 3) + " " + passage),
    (3L, words("unrelated", 40)),
    (4L, words("short", 10)),
    (5L, passage.split(" ").take(16).mkString(" ")),
    (6L, privatePassage + " " + privatePassage)
  ).toDF("doc_id", "text")

  private lazy val substr =
    Dedup.substringDedup(docs, "doc_id", "text", k = 16)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3))))).toMap

  test("substring dedup: overlapping windows union to the exact shared span") {
    // docs 1/2 share the 20-token passage: five 16-token alignments
    // flag it, their positional union is exactly the 20 passage
    // tokens — no chunk rounding on either side
    assert(substr(1L)._1 == 33L && substr(1L)._2 == 20L)
    assert(substr(2L)._1 == 23L && substr(2L)._2 == 20L)
    // cleaned text = the non-passage tokens, in order
    val expectClean1 = words("apre", 8) + " " + words("atail", 5)
    val expectHash = java.security.MessageDigest.getInstance("MD5")
      .digest(expectClean1.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(substr(1L)._3.contains(expectHash))
  }

  test("substring dedup: doc 5 (16-token slice of the passage) is fully covered") {
    // its single window matches docs 1/2 → every token covered →
    // nothing kept, NULL clean hash
    assert(substr(5L) == ((16L, 16L, None)))
  }

  test("substring dedup: unrelated, short, and within-doc-repeat docs survive whole") {
    assert(substr(3L)._2 == 0L && substr(3L)._3.isDefined)
    assert(substr(4L)._2 == 0L) // < k tokens: no windows at all
    // doc 6's repeated passage exists in ONE distinct document only —
    // the cross-document frequency test must not flag it
    assert(substr(6L)._2 == 0L && substr(6L)._3.isDefined)
  }

  private def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)

  test("kmeans: iters=0 assigns the k lowest-id points to their own cluster at distance 0") {
    val emb = Seq(
      (0L, vec(1, 0, 0)), (1L, vec(0, 1, 0)),
      (2L, vec(0.9, 0.1, 0)), (3L, vec(0.1, 0.9, 0))
    ).toDF("vec_id", "embedding")
    val a = Similarity.kmeansAssignments(emb, "vec_id", "embedding",
      k = 2, iters = 0)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(a(0L) == ((0, 0.0)) && a(1L) == ((1, 0.0)))
    assert(a(2L)._1 == 0 && a(3L)._1 == 1)
  }

  test("kmeans: separable groups converge to the group structure, deterministically") {
    val groupA = (0 until 6).map(i => (i.toLong, vec(10 + 0.01 * i, 0, 0)))
    val groupB = (6 until 12).map(i => (i.toLong, vec(0, 10 + 0.01 * i, 0)))
    val emb = (groupA ++ groupB).toDF("vec_id", "embedding")
    def run() = Similarity.kmeansAssignments(emb, "vec_id", "embedding",
      k = 2, iters = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1).toSeq
    val r1 = run()
    assert(r1 == run(), "re-run must be bit-identical")
    val byCluster = r1.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    assert(byCluster.values.toSet ==
      Set((0L until 6L).toSet, (6L until 12L).toSet))
  }

  test("lm examples: stride-16/window-17 blocks share one boundary token and shift by one") {
    val toks = (1 to 20).map(i => s"w$i")
    val df = Seq((1L, toks.mkString(" ")), (2L, "only"), (3L, "a b"))
      .toDF("doc_id", "text")
    // drive the public query against a scratch table dir — same code
    // path the driver uses
    val dir = java.nio.file.Files.createTempDirectory("lmex").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curation.defs("q_lm_examples")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // doc 1: 20 tokens → block 1 = w1..w17, block 2 = w17..w20
    assert(out.filter(_._1 == 1L).toSeq == Seq(
      (1L, 1L, 16L, md5(toks.take(16).mkString(" ")),
        md5(toks.slice(1, 17).mkString(" "))),
      (1L, 2L, 3L, md5(toks.slice(16, 19).mkString(" ")),
        md5(toks.slice(17, 20).mkString(" ")))))
    // 1-token doc yields nothing; 2-token doc yields a single pair
    assert(!out.exists(_._1 == 2L))
    assert(out.filter(_._1 == 3L).toSeq ==
      Seq((3L, 1L, 1L, md5("a"), md5("b"))))
  }

  test("expectations: planted violations are counted exactly, one per constraint") {
    val df = Seq(
      (1L, "good text here", "en", "src0", 14L),
      (1L, "dup id", "en", "src1", 6L), // violates doc_id_unique
      (2L, "", "en", "src2", 0L), // violates text_nonempty
      (3L, "wrong count", "en", "src3", 99L), // violates n_chars_consistent
      (4L, "bad lang", "EN!", "src4", 8L), // violates lang_iso2
      (5L, "bad source", "fr", "other", 10L) // violates source_pattern
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("expect").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curation.defs("q_expectations")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(out("doc_id_unique") == ((1L, false)))
    assert(out("text_nonempty") == ((1L, false)))
    assert(out("n_chars_consistent") == ((1L, false)))
    assert(out("lang_iso2") == ((1L, false)))
    assert(out("source_pattern") == ((1L, false)))
    assert(out("n_chars_bounds") == ((1L, false))) // the empty doc's 0 chars
  }

  test("split leakproof: near-dup cluster members land in the same split") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 29).map(i => s"tok$i").mkString(" ") + " tokX"
    val df = Seq(
      (10L, base), (11L, nearDup), // a near-dup pair (J >> 0.5)
      (12L, (100 to 130).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text").withColumn("source", lit("src0"))
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("leak").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Curation.defs("q_split_leakproof")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // both members of the cluster share the min-id representative AND
    // the split; the unrelated doc keys on itself
    assert(out(10L)._1 == 10L && out(11L)._1 == 10L)
    assert(out(10L)._2 == out(11L)._2)
    assert(out(12L)._1 == 12L)
  }

  test("audio search: the probe ranks itself first at cosine 1") {
    val rows = Curation.defs("q_audio_search")(spark, sf).collect()
    assert(rows.length == 10)
    val probeId = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 1)
      .agg(min("doc_id")).head().getLong(0)
    assert(rows.head.getLong(0) == probeId)
    assert(math.abs(rows.head.getDouble(1) - 1.0) < 1e-6)
    val cosines = rows.map(_.getDouble(1))
    assert(cosines.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("video search: the probe ranks itself first at cosine 1") {
    val rows = Curation.defs("q_video_search")(spark, sf).collect()
    assert(rows.length == 10)
    val probeId = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 2)
      .agg(min("doc_id")).head().getLong(0)
    assert(rows.head.getLong(0) == probeId)
    assert(math.abs(rows.head.getDouble(1) - 1.0) < 1e-6)
  }

  test("hard negatives: exactly 5 per probe, never the probe's own label, ranked by cosine") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val labelOf = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 20)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val allLabels = emb.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val rows = Curation.defs("q_hard_negatives")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 20 * 5)
    rows.groupBy(_._1).foreach { case (qid, group) =>
      assert(group.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      // no negative shares the probe's label (the filter's whole point)
      group.foreach { case (_, _, vid, _) =>
        assert(allLabels(vid) != labelOf(qid), s"probe $qid mined same-label $vid")
      }
      // ranks descend in cosine
      val byRank = group.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("mix weights: fractions sum to 1, weights rebalance toward uniform") {
    val rows = Curation.defs("q_mix_weights")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-3)
    // weight * natural == uniform target for every source
    val target = 1.0 / rows.length
    rows.foreach { case (src, nat, wt) =>
      assert(math.abs(wt * nat - target) < 1e-4, s"$src: $wt * $nat != $target")
    }
  }

  test("retrieval metrics: every probe self-hits at rank 1 (MRR = 1), metrics in [0,1]") {
    val m = Curation.defs("q_eval_retrieval")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(m.length == 20)
    m.foreach { case (_, recall, mrr, ndcg) =>
      assert(mrr == 1.0) // the probe's own vector: cosine 1, lowest rank
      assert(recall > 0.0 && recall <= 1.0)
      assert(ndcg > 0.0 && ndcg <= 1.0)
      assert(ndcg >= recall * 0.2) // sanity: relevance found can't vanish from DCG
    }
  }
}
