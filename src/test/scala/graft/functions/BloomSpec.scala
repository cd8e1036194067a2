package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class BloomSpec extends SparkTestBase {
  import spark.implicits._

  test("no false negatives: every inserted key probes true") {
    val f = Bloom.LongBloomFilter.sized(1000, 0.01)
    (0L until 1000L).foreach(i => f.add(i * 2654435761L))
    assert((0L until 1000L).forall(i => f.contains(i * 2654435761L)))
  }

  test("false-positive rate stays near the configured fpp") {
    val f = Bloom.LongBloomFilter.sized(1000, 0.01)
    (0L until 1000L).foreach(f.add)
    // probe 10k keys that were never inserted
    val fp = (10000L until 20000L).count(f.contains)
    assert(fp < 10000 * 0.03, s"fp rate ${fp / 10000.0} way above configured 0.01")
  }

  test("serialize round-trips bits and hash count") {
    val f = Bloom.LongBloomFilter.sized(100, 0.05)
    Seq(1L, -7L, Long.MaxValue, Long.MinValue, 0L).foreach(f.add)
    val g = Bloom.LongBloomFilter.deserialize(f.serialize)
    assert(g.numHashes == f.numHashes)
    assert(Seq(1L, -7L, Long.MaxValue, Long.MinValue, 0L).forall(g.contains))
  }

  test("distributed build merges partial filters (no lost keys)") {
    val keys = spark.range(0, 5000).repartition(8).select(col("id"))
    val bytes = Bloom.buildFilter(keys, "id", expectedN = 5000)
    val f = Bloom.LongBloomFilter.deserialize(bytes)
    assert((0L until 5000L).forall(f.contains))
  }

  test("buildFilter skips null keys") {
    val df = Seq(Some(1L), None, Some(2L)).toDF("k")
    val f = Bloom.LongBloomFilter.deserialize(
      Bloom.buildFilter(df, "k", expectedN = 2))
    assert(f.contains(1L) && f.contains(2L))
  }

  test("prunedSemiJoin is identical to the plain semi join") {
    val fact = Tables.lineitem(spark, sf)
    val dim = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val pruned = Bloom.prunedSemiJoin(fact, dim, "l_orderkey", "o_orderkey",
      expectedN = math.max(1L, dim.count()))
    val plain = fact.join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(pruned.count() == plain.count())
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("bloom probe prunes the scan before the exchange (selectivity observed)") {
    val fact = Tables.lineitem(spark, sf)
    val dim = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val bytes = Bloom.buildFilter(dim, "o_orderkey", math.max(1L, dim.count()))
    val kept = fact.filter(Bloom.bloomContains(bytes, col("l_orderkey"))).count()
    val total = fact.count()
    val trueMatches = fact
      .join(dim, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    // the probe keeps all true matches and prunes most of the rest
    assert(kept >= trueMatches)
    assert(kept < total * 0.5,
      s"bloom kept $kept of $total rows — not selective (true: $trueMatches)")
  }

  test("graft_bloom_contains rejects a non-foldable filter side") {
    val df = Seq((Array[Byte](1, 2), 1L)).toDF("f", "k")
    val e = intercept[Exception] {
      df.select(call_function("graft_bloom_contains", col("f"), col("k"))).collect()
    }
    assert(e.getMessage.contains("foldable"))
  }
}
