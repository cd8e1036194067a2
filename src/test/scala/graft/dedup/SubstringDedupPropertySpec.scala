package graft.dedup

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Property-based invariants for the rolling-window substring dedup,
  * against generated corpora (fixed-seed scalacheck Gens, same
  * offline pattern as operators.PropertySpec) and a reference
  * single-machine implementation of the same semantics:
  *
  *  - accounting: 0 ≤ n_dup_tokens ≤ n_tokens for every doc;
  *  - clean_hash is NULL exactly when every token is covered;
  *  - the distributed result equals a brute-force reference
  *    (all windows → cross-doc duplicated windows → positional
  *    union) for any corpus shape — including within-doc repeats,
  *    sub-k documents, and multi-way sharing.
  */
class SubstringDedupPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(7L + i)))

  // small vocabulary + short docs → dense window collisions, the
  // regime where coverage union/boundary bugs would show
  private val corpusGen: Gen[List[(Long, String)]] = for {
    nDocs <- Gen.choose(2, 8)
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.choose(0, 14)
      toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
    } yield toks.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def reference(docs: List[(Long, String)], k: Int):
      Map[Long, (Long, Long, Option[String])] = {
    def toks(t: String) = t.split(" ", -1).toList
    val windows = docs.flatMap { case (id, t) =>
      val ts = toks(t)
      (0 to ts.length - k).map(i => (id, i, ts.slice(i, i + k).mkString(" ")))
    }
    val dup = windows.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.size >= 2).keySet
    val covered: Map[Long, Set[Int]] = windows
      .filter(w => dup(w._3))
      .groupBy(_._1)
      .view.mapValues(_.flatMap(w => w._2 until (w._2 + k)).toSet).toMap
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    docs.map { case (id, t) =>
      val ts = toks(t)
      val cov = covered.getOrElse(id, Set.empty)
      val kept = ts.zipWithIndex.collect { case (w, i) if !cov(i) => w }
      id -> ((ts.length.toLong, cov.size.toLong,
        if (kept.isEmpty) None else Some(md5(kept.mkString(" ")))))
    }.toMap
  }

  test("substring dedup equals the brute-force reference on arbitrary corpora") {
    val k = 4
    for (docs <- samples(corpusGen, 12)) {
      val got = Dedup.substringDedup(docs.toDF("doc_id", "text"),
        "doc_id", "text", k = k)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), Option(r.getString(3))))).toMap
      val want = reference(docs, k)
      assert(got == want, s"corpus: $docs")
      got.values.foreach { case (n, dup, hash) =>
        assert(dup >= 0 && dup <= n)
        assert(hash.isEmpty == (dup == n))
      }
    }
  }
}
