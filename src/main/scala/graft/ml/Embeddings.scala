package graft.ml

import org.apache.spark.ml.feature.{IDF, Word2Vec}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding GENERATION over the document store — the MLlib leg of the
  * north star ("DataFrame ETL + MLlib embeddings over document
  * store"): documents go in, `array<float>` embedding columns come
  * out, ready for the existing similarity/dedup stack
  * ([[graft.similarity.Similarity]], [[graft.dedup.Dedup]]).
  * Reference analogue: the pipeline's representation step that turns
  * topic text into structured vectors of meaning
  * (syllabus_ai_graph.py:45-90) — here re-expressed as corpus-level
  * statistical embeddings rather than per-call LLM output.
  *
  * Two generators:
  *  - TF-IDF over a deterministic vocabulary, weighted by
  *    [[org.apache.spark.ml.feature.IDF]] — exactly reproducible, so
  *    the weights carry a DuckDB oracle (q_embed_generate).
  *  - [[org.apache.spark.ml.feature.Word2Vec]] doc vectors (mean of
  *    word vectors) — seeded + single-partition fit for determinism;
  *    spec-checked (no closed-form oracle exists for SGD weights).
  *
  * Scale: tokenize/TF/DF are one explode + two hash aggregations; the
  * vocabulary cut is a distributed top-V (TakeOrderedAndProject), and
  * only `vocabSize` rows ever reach the driver. IDF.fit is a single
  * treeAggregate pass over the TF vectors (constant-size state:
  * vocabSize doubles per partition). Nothing driver-side grows with
  * the corpus.
  */
object Embeddings {

  /** (id, term, tf) token counts; single-space split, `string_split`
    * parity (empty tokens kept) so the oracle restates it exactly.
    */
  private def termCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))

  /** Deterministic vocabulary: top `vocabSize` terms by document
    * frequency, ties broken lexicographically — (term, df, pos) with
    * pos ∈ [0, vocabSize). The top-V cut is distributed (orderBy +
    * limit plans as a per-partition heap); the row_number window runs
    * over the already-cut vocabSize rows only.
    */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    val dfreq = termCounts(docs, idCol, textCol)
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    dfreq.orderBy(col("df").desc, col("term")).limit(vocabSize)
      .withColumn("pos",
        row_number().over(Window.orderBy(col("df").desc, col("term"))) - 1)
  }

  /** Per-document TF vectors over the vocabulary as ml
    * `SparseVector`s, plus the IDF-weighted vectors from a fitted
    * [[IDF]] model: (id, tf_vec, tfidf_vec). Every input document
    * yields a row (docs with no vocabulary term get the empty sparse
    * vector — they still count toward the model's corpus size m,
    * matching the oracle's N).
    */
  def tfidfVectors(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    val vocab = vocabulary(docs, idCol, textCol, vocabSize)
    // entry ordering and value extraction run relationally
    // (array_sort over the collected (pos, tf) structs + two codegen
    // transforms — the r11 version sorted and unpacked Rows inside
    // the closure, ADVICE r11 #4); the remaining UDF is a
    // CONSTRUCTOR-ONLY bridge to VectorUDT (two array copies), the
    // same role MLlib's own array_to_vector plays for dense vectors.
    // Measured alternatives both lose: the original in-closure
    // sort/unpack, and a fully-relational DENSE rewrite
    // (sequence + per-position map element_at = an O(vocab·nnz)
    // linear scan per row — it DOUBLED q_embed_generate/search).
    val entries = termCounts(docs, idCol, textCol)
      .join(broadcast(vocab.select(col("term"), col("pos"))), "term")
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("tf")))).as("es"))
    val toVec = udf((pos: Seq[Int], vals: Seq[Double]) =>
      Vectors.sparse(vocabSize,
        if (pos == null) Array.emptyIntArray else pos.toArray,
        if (vals == null) Array.emptyDoubleArray else vals.toArray))
    val withTf = docs.select(col(idCol))
      .join(entries, Seq(idCol), "left")
      .select(col(idCol), toVec(
        transform(col("es"), e => e.getField("pos")),
        transform(col("es"), e => e.getField("tf").cast("double")))
        .as("tf_vec"))
    // the real MLlib fit: idf_j = ln((m+1)/(df_j+1)), df_j = #docs
    // with a nonzero at position j — identical to the term df above
    val model = new IDF().setInputCol("tf_vec").setOutputCol("tfidf_vec")
      .fit(withTf)
    model.transform(withTf)
  }

  /** TF-IDF document embeddings as `array<float>` — the generated twin
    * of the pre-computed `embeddings` table, drop-in for
    * Similarity/Dedup.
    */
  def tfidfEmbeddings(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 256): DataFrame =
    tfidfVectors(docs, idCol, textCol, vocabSize)
      .select(col(idCol),
        vector_to_array(col("tfidf_vec"), "float32").as("embedding"))

  /** Word2Vec document embeddings (mean of word vectors) as
    * `array<float>`. Deterministic by construction: fixed seed,
    * numPartitions=1 (multi-partition SGD merges in nondeterministic
    * order), one iteration. At real scale raise numPartitions and
    * accept run-to-run drift, or persist the fitted model — the
    * determinism knob is a correctness-harness need, not a training
    * requirement.
    */
  def word2vecEmbeddings(docs: DataFrame, idCol: String, textCol: String,
      dim: Int = 32, seed: Long = 42L, minCount: Int = 2): DataFrame = {
    val toks = docs.select(col(idCol),
      array_remove(split(col(textCol), " "), "").as("tokens"))
    val model = new Word2Vec()
      .setInputCol("tokens").setOutputCol("vec")
      .setVectorSize(dim).setSeed(seed).setMinCount(minCount)
      .setNumPartitions(1).setMaxIter(1)
      .fit(toks)
    model.transform(toks)
      .select(col(idCol), vector_to_array(col("vec"), "float32").as("embedding"))
  }
}
