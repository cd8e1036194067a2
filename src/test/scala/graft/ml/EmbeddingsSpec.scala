package graft.ml

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.dedup.Dedup
import graft.similarity.Similarity

class EmbeddingsSpec extends SparkTestBase {

  private lazy val docs = Tables.documents(spark, sf)

  test("tfidf embeddings: vocabSize dims, weight = tf * ln((m+1)/(df+1))") {
    val vecs = Embeddings.tfidfEmbeddings(docs, "doc_id", "text", vocabSize = 64)
    assert(vecs.count() == docs.count()) // every doc embeds, even vocab-less ones
    assert(vecs.select(size(col("embedding"))).distinct().head().getInt(0) == 64)

    // cross-check one weight relationally: pick the vocab term at pos 0
    val vocab = Embeddings.vocabulary(docs, "doc_id", "text", 64)
      .orderBy("pos").collect()
    val (term0, df0) = (vocab(0).getAs[String]("term"), vocab(0).getAs[Long]("df"))
    val m = docs.count()
    val someDoc = docs
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), t => t === term0)).as("tf"))
      .filter(col("tf") > 0).orderBy("doc_id").head()
    val expected =
      someDoc.getInt(1) * math.log((m + 1.0) / (df0 + 1.0))
    val got = vecs.filter(col("doc_id") === someDoc.getLong(0))
      .select(element_at(col("embedding"), 1)).head().getFloat(0)
    assert(math.abs(got - expected) < 1e-4,
      s"weight mismatch for '$term0': got $got expected $expected")
  }

  test("generated tfidf embeddings feed the similarity stack (self-query ranks first)") {
    val vecs = Embeddings.tfidfEmbeddings(docs, "doc_id", "text", vocabSize = 64)
    val q = vecs.filter(col("doc_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val top = Similarity.bruteForceTopK(vecs, "doc_id", "embedding", q, k = 5)
      .collect()
    assert(top.head.getLong(0) == 0L, "query doc should be its own nearest neighbour")
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-9)
  }

  test("generated embeddings run through the near-dup blocking path") {
    val vecs = Embeddings.tfidfEmbeddings(docs, "doc_id", "text", vocabSize = 64)
    // threshold 0 with coarse blocking: just proves the generated
    // schema/typing composes with the dedup operator end-to-end
    val pairs = Dedup.embeddingNearDups(vecs, "doc_id", "embedding",
      threshold = 0.99, signBits = 4)
    // no exact duplicates exist in the corpus, so pairs at 0.99 are
    // few-to-none — the assertion is shape, not content
    assert(pairs.columns.toSeq == Seq("id_a", "id_b", "cosine"))
    pairs.count() // executes the plan
  }

  test("word2vec doc embeddings are deterministic and self-similar") {
    val a = Embeddings.word2vecEmbeddings(docs, "doc_id", "text", dim = 16)
      .orderBy("doc_id").collect()
    val b = Embeddings.word2vecEmbeddings(docs, "doc_id", "text", dim = 16)
      .orderBy("doc_id").collect()
    assert(a.length == docs.count())
    assert(a.map(_.getSeq[Float](1)).toSeq == b.map(_.getSeq[Float](1)).toSeq,
      "seeded single-partition word2vec must be run-to-run deterministic")

    val vecs = Embeddings.word2vecEmbeddings(docs, "doc_id", "text", dim = 16)
    val q = vecs.filter(col("doc_id") === 1)
      .select(col("embedding")).head().getSeq[Float](0)
    if (q.exists(_ != 0f)) {
      val top = Similarity.bruteForceTopK(vecs, "doc_id", "embedding", q, k = 3)
        .collect()
      assert(top.head.getLong(0) == 1L)
    }
  }
}
