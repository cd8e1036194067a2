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
}
