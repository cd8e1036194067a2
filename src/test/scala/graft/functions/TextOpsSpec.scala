package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("shingles: k-grams in order, distinct, empty for short docs") {
    val df = Seq("a b c d", "a b", "x x x x x").toDF("t")
    val got = df.select(TextOps.shingles(TextOps.tokenize(col("t")), 3))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq.empty)
    assert(got(2) == Seq("x x x")) // distinct collapses repeats
  }

  test("fingerprint is word-order insensitive, content sensitive") {
    val df = Seq(("a", "spark shuffles data fast"),
      ("b", "fast data shuffles spark"),
      ("c", "spark shuffles data slow")).toDF("id", "t")
    val fp = df.select(col("id"), TextOps.fingerprint(col("t")))
      .as[(String, String)].collect().toMap
    assert(fp("a") == fp("b"))
    assert(fp("a") != fp("c"))
  }

  test("langGuess picks the language with most stopword hits, deterministic tie order") {
    val df = Seq(
      "the cat and the dog in the house",
      "der hund und die katze ist nicht da",
      "le chat et le chien est pas la",
      "zz yy xx ww").toDF("t")
    val got = df.select(TextOps.langGuess(TextOps.tokenize(col("t"))))
      .as[String].collect().toSeq
    assert(got == Seq("en", "de", "fr", "unknown"))
  }

  test("punctRatio and stopwordRatio bounded in [0,1]") {
    val d = graft.Tables.documents(spark, sf)
    val bad = d.select(
      TextOps.punctRatio(col("text")).as("p"),
      TextOps.stopwordRatio(TextOps.tokenize(col("text"))).as("s"))
      .filter(col("p") < 0 || col("p") > 1 || col("s") < 0 || col("s") > 1)
    assert(bad.count() == 0)
  }

  test("tokenizeRegex splits words and punctuation") {
    val got = Seq("don't stop, believing!").toDF("t")
      .select(TextOps.tokenizeRegex(col("t"))).as[Seq[String]].head()
    assert(got == Seq("don", "'", "t", "stop", ",", "believing", "!"))
  }

  test("phraseOccurrences finds planted phrases with counts and 1-based first position") {
    val docs = Seq(
      (1L, "hash join is fast and hash join wins"), // two occurrences, first at 1
      (2L, "a hash join b"),                        // one, at 2
      (3L, "join hash"),                            // reversed — no match
      (4L, "hash only join apart"),                 // non-adjacent — no match
      (5L, "hash hash join")                        // overlap guard: one match at 2
    ).toDF("doc_id", "text")
    val got = TextOps.phraseOccurrences(docs, "doc_id", "text", Seq("hash", "join"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 2L, 1L), (2L, 1L, 2L), (5L, 1L, 2L)))
  }

  test("phraseOccurrences chains 3-term phrases and repeated terms") {
    val docs = Seq(
      (1L, "fast hash join now"),     // 3-term match at 2
      (2L, "fast hash miss join"),    // broken chain
      (3L, "go go go")                // repeated-term phrase below
    ).toDF("doc_id", "text")
    val three = TextOps.phraseOccurrences(docs, "doc_id", "text",
      Seq("fast", "hash", "join")).as[(Long, Long, Long)].collect().toSeq
    assert(three == Seq((1L, 1L, 1L)))
    val rep = TextOps.phraseOccurrences(docs, "doc_id", "text", Seq("go", "go"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(rep == Seq((3L, 2L, 1L))) // positions 1-2 and 2-3
  }
}
