package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a training-data pipeline: tokenizing,
  * quality scoring, language ID, fingerprinting. Built-in functions
  * only — every expression is codegen'd and runs row-parallel with no
  * shuffle of its own.
  */
object TextOps {

  /** Whitespace tokenizer (single-space corpus; use tokenizeRegex for
    * arbitrary whitespace).
    */
  def tokenize(text: Column): Column = split(text, " ")

  /** BPE-ish regex tokenizer: words, numbers, or single punctuation. */
  def tokenizeRegex(text: Column): Column =
    filter(split(text, "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"),
      t => t =!= "" && t =!= " ")

  /** Count of tokens from `toks` that appear in `vocab`. */
  def hitCount(toks: Column, vocab: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(vocab))).cast("long")

  // Tiny per-language stopword lists for the n-gram/stopword language
  // heuristic. Deliberately small + disjoint-ish; the contract is
  // determinism, not linguistic accuracy.
  val stopEn: Seq[String] = Seq("the", "and", "of", "to", "in", "is", "a")
  val stopDe: Seq[String] = Seq("der", "die", "das", "und", "ist", "nicht", "ein")
  val stopFr: Seq[String] = Seq("le", "les", "et", "est", "pas", "une", "dans")
  val stopEs: Seq[String] = Seq("el", "los", "y", "es", "no", "una", "por")

  /** Stopword-hit language ID with a fixed priority order on ties
    * (en > de > fr > es > unknown). Deterministic by construction.
    */
  def langGuess(toks: Column): Column = {
    val en = hitCount(toks, stopEn); val de = hitCount(toks, stopDe)
    val fr = hitCount(toks, stopFr); val es = hitCount(toks, stopEs)
    when(en + de + fr + es === 0, "unknown")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Punctuation ratio: fraction of characters that are ASCII
    * punctuation. Uses an explicit character class (identical
    * semantics in Java regex and RE2/DuckDB).
    */
  def punctRatio(text: Column): Column = {
    val noPunct = regexp_replace(text, "[!-/:-@\\[-`{-~]", "")
    when(length(text) > 0,
      (length(text) - length(noPunct)).cast("double") / length(text))
      .otherwise(0.0)
  }

  /** Stopword ratio over whitespace tokens (English list). */
  def stopwordRatio(toks: Column): Column =
    when(size(toks) > 0, hitCount(toks, stopEn).cast("double") / size(toks))
      .otherwise(0.0)

  /** Order-insensitive document fingerprint: md5 of the sorted,
    * lower-cased token multiset. Identical in DuckDB
    * (md5(array_to_string(list_sort(...), ' '))).
    */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(split(lower(text), " ")), " "))

  /** Word k-shingles as a distinct array of strings; empty when the
    * document has fewer than k tokens (sequence() would otherwise
    * produce a descending range). slice+array_join is ~4x faster than
    * k element_at lookups + concat_ws inside the (interpreted) lambda.
    */
  def shingles(toks: Column, k: Int): Column = {
    val n = size(toks)
    when(n >= k,
      array_distinct(transform(sequence(lit(0), n - k), i =>
        array_join(slice(toks, i + 1, lit(k)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact phrase match over a positional inverted index: documents
    * containing `phrase` as consecutive tokens, with occurrence count
    * and first (1-based) position. Each phrase term's postings are
    * pruned BEFORE the join (`tok isin phrase` pushes into the scan),
    * then chained on `(doc, pos + offset)` equality — work scales
    * with the phrase terms' posting lists, never the corpus token
    * count. At real scale the postings table is written once
    * partitioned by token, making the term prune a partition prune —
    * the same serving layout as
    * [[graft.similarity.Similarity.postingsTopK]] uses for sparse
    * vectors.
    */
  def phraseOccurrences(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty)
    val pos = docs.select(col(idCol),
      posexplode(tokenize(col(textCol))).as(Seq("pos", "tok")))
      .filter(col("tok").isin(phrase: _*))
    val head = pos.filter(col("tok") === phrase.head)
      .select(col(idCol), (col("pos") + 1).cast("long").as("first_pos"))
    phrase.zipWithIndex.drop(1).foldLeft(head) { case (acc, (term, i)) =>
      val nxt = pos.filter(col("tok") === term)
        .select(col(idCol).as("id_n"), col("pos").cast("long").as("pos_n"))
      acc.join(nxt, col(idCol) === col("id_n") &&
        col("pos_n") === col("first_pos") - 1 + i)
        .drop("id_n", "pos_n")
    }
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_occurrences"), min(col("first_pos")).as("first_pos"))
  }
}
