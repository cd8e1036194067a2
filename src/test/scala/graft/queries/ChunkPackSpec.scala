package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** Conservation invariants for the sequence-prep queries: chunking
  * must be lossless (chunks reassemble to the document) and packing
  * must conserve tokens (pack sums equal corpus sums).
  */
class ChunkPackSpec extends SparkTestBase {

  test("chunks reassemble to the original text, in order, losslessly") {
    val chunks = Analytics.defs("q_chunk")(spark, sf)
    val rebuilt = chunks
      .groupBy(col("doc_id"))
      // chunk order must ride the data, not group order: sort the
      // (idx, text) structs, then join the texts
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
        s => s.getField("chunk_text")), " ").as("rebuilt"))
    val joined = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).join(rebuilt, "doc_id")
    assert(joined.filter(col("text") =!= col("rebuilt")).count() == 0)
    assert(joined.count() == Tables.documents(spark, sf).count())
  }

  test("packs conserve tokens and cut at the budget boundary") {
    val packs = Analytics.defs("q_pack")(spark, sf).cache()
    try {
      val packTotal = packs.agg(sum(col("tok_sum"))).head().getLong(0)
      val corpusTotal = Tables.documents(spark, sf)
        .select(size(split(col("text"), " ")).cast("long").as("n"))
        .agg(sum(col("n"))).head().getLong(0)
      assert(packTotal == corpusTotal)
      // every pack's START offset is pack_id * budget by construction:
      // cumulative token count up to and including a pack crosses the
      // next boundary only in its last (possibly straddling) document,
      // so each non-final pack of a source holds >= 1 document and the
      // per-source pack ids are contiguous from 0
      val perSource = packs.groupBy(col("source"))
        .agg(min(col("pack_id")).as("mn"), max(col("pack_id")).as("mx"),
          count(lit(1)).as("n"))
      assert(perSource.filter(col("mn") =!= 0).count() == 0)
      assert(perSource.filter(col("n") =!= col("mx") + 1).count() == 0)
    } finally packs.unpersist()
  }
}
