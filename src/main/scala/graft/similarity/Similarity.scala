package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — one codegen'd pass over the
  * corpus, planned as TakeOrderedAndProject (per-partition heap of k,
  * then a k-row merge on the driver; no global sort, no collect of
  * the corpus). On a 1000-executor cluster this is the right exact
  * algorithm: the query vector is a broadcast literal and the scan is
  * embarrassingly parallel.
  *
  * Scale path: sign-bit LSH bucketing — probe only buckets within
  * Hamming distance `probeHamming` of the query's bucket, trading
  * recall for a corpus-fraction scan. Bucket ids are cheap determinist
  * functions of the vector, so the bucketed corpus can be written
  * bucket-partitioned and pruned at scan time.
  */
object Similarity {

  /** Cosine similarity of each row's `vecCol` against a literal query
    * vector, exact top-k (ties broken by id ascending).
    */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = typedlit(query)
    // double-typed corpora stay on the full-double relational cosine
    // (the float kernel narrows; near-threshold ranks could flip)
    val cos = VectorOps.cosineFor(emb, vecCol)
    emb.select(col(idCol), cos(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Exact sparse top-k via an inverted postings layout — the
    * production shape for SPARSE vectors (the TF-IDF/BM25 class),
    * where IVF cells cluster poorly: each vector's nonzero
    * (pos, weight) entries become postings rows, and a query touches
    * ONLY the postings of its own nonzero positions. Work scales with
    * matching postings, not corpus size — at real scale the postings
    * table is written once partitioned by `pos`, turning the cut into
    * a partition prune, and the per-doc norms are a stored serving
    * artifact (both recomputed here because the API takes a raw
    * embedding column).
    *
    * EXACT, not approximate — and bit-identical to
    * [[bruteForceTopK]]: the per-doc partial products are re-folded
    * in position order (`sort_array` over the ≤ query-nnz collected
    * entries), reproducing [[VectorOps.cosine]]'s sequential fold
    * exactly, because the terms that fold skips here are all exact
    * +0.0 contributions. The group-side state per doc is bounded by
    * the query's nonzero count, so the aggregation never holds a
    * corpus-sized vector.
    *
    * Malformed rows agree with the kernel too (ADVICE r5): a corpus
    * vector whose length differs from the query's, or that contains
    * null elements, gets null cosine — the same answer
    * [[graft.functions.VectorOps.cosine]] gives — instead of a value
    * silently computed from the overlapping nonzero positions.
    */
  def postingsTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val qnz = query.zipWithIndex.collect { case (w, p) if w != 0f => (p, w) }
    val qnorm = math.sqrt(
      query.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    val spark = emb.sparkSession
    import spark.implicits._
    val qdf = broadcast(qnz.toDF("pos", "qw"))
    // rows the native kernel would null out (length mismatch, null
    // element, null vector) must null out here too, not silently score
    // on the overlapping positions
    val conforms = coalesce(
      size(col(vecCol)) === query.length &&
        !exists(col(vecCol), x => x.isNull),
      lit(false))
    val norms = emb.select(col(idCol),
      VectorOps.normFor(emb, vecCol)(col(vecCol)).as("norm"),
      conforms.as("_conforms"))
    val postings = emb
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("pos", "w")))
      .filter(col("w") =!= 0f)
    val dots = postings.join(qdf, "pos")
      .select(col(idCol), struct(col("pos"),
        (col("w").cast("double") * col("qw").cast("double")).as("p")).as("pp"))
      .groupBy(idCol)
      .agg(aggregate(sort_array(collect_list(col("pp"))), lit(0.0),
        (acc, x) => acc + x.getField("p")).as("dot"))
    // left join: docs with no overlapping nonzero position have dot 0;
    // zero-norm vectors get null cosine (the VectorOps.cosine contract)
    norms.join(dots, Seq(idCol), "left")
      .select(col(idCol),
        when(!col("_conforms") || col("norm") * qnorm === 0.0,
          lit(null).cast("double"))
          .otherwise(coalesce(col("dot"), lit(0.0)) / (col("norm") * lit(qnorm)))
          .as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** LSH-bucketed approximate top-k: compare only vectors whose
    * sign-bit bucket is within `probeHamming` bit flips of the query
    * bucket. With signBits=b and probeHamming=1, scans ~(1+b)/2^b of
    * the corpus.
    */
  def bucketedTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, signBits: Int = 8,
      probeHamming: Int = 1): DataFrame = {
    val qBucket: Long = query.take(signBits)
      .foldLeft(0L)((acc, x) => acc * 2 + (if (x >= 0f) 1L else 0L))
    // every bucket within Hamming distance probeHamming — full
    // combination enumeration, not just single-bit flips (C(b,h)
    // buckets; b and h are small by construction)
    val probes: Seq[Long] = {
      def flips(h: Int): Iterator[Long] =
        (0 until signBits).combinations(h)
          .map(_.foldLeft(qBucket)((b, i) => b ^ (1L << i)))
      (0 to math.min(probeHamming, signBits)).iterator
        .flatMap(flips).toSeq.distinct
    }
    val q = typedlit(query)
    val cos = VectorOps.cosineFor(emb, vecCol)
    emb.select(col(idCol), col(vecCol),
      VectorOps.signBucket(col(vecCol), signBits).as("bucket"))
      .filter(col("bucket").isin(probes: _*))
      .select(col(idCol), cos(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Matryoshka-style two-stage ANN: rank the corpus by cosine on the
    * first `prefixDim` dimensions only, keep the top `c` candidates,
    * then re-rank exactly at full dimension. The final ranking over
    * the candidate set is EXACT — all approximation lives in the
    * candidate cut, the same contract as [[graft.similarity.PqIndex]]'s
    * ADC scan but with a projection instead of a quantization.
    *
    * On MRL-trained embeddings the prefix carries most of the signal
    * by construction, so small c reaches high recall; on generic
    * embeddings (this corpus) the prefix is a lossy projection and c
    * must scale with n — the calling query gates recall in-query,
    * the honest-ANN pattern q_sim_ivf/q_sim_pq established. At scale
    * the candidate stage reads prefixDim/dim of the arithmetic; with
    * the prefix materialized as its own column (the production
    * layout — one extra narrow column, written once), it reads
    * prefixDim/dim of the BYTES too, PQ's bandwidth economics with
    * zero quantization error in the re-rank.
    *
    * Both stages are TakeOrdered (per-partition heap + driver merge of
    * c resp. k rows) — no global sort, no corpus collect.
    */
  def mrlTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, prefixDim: Int, c: Int): DataFrame = {
    val cos = VectorOps.cosineFor(emb, vecCol)
    val cands = emb.select(col(idCol), col(vecCol),
        cos(slice(col(vecCol), 1, prefixDim),
          typedlit(query.take(prefixDim))).as("pcos"))
      .orderBy(col("pcos").desc, col(idCol))
      .limit(c)
    cands.select(col(idCol), cos(col(vecCol), typedlit(query)).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** IVF (inverted-file) approximate top-k — the classic ANN scale
    * path: k-means-partition the corpus into `nCentroids` cells, then
    * scan only the `nProbe` cells nearest the query.
    *
    * Fully deterministic: initial centroids are a hash-ordered sample
    * (no rand()), Lloyd refinement is a fixed `iters` rounds, ties
    * break by index. Only the tiny centroid table ever reaches the
    * driver (nCentroids × dim); assignment is a broadcast argmin over
    * the corpus and the per-cell mean is a posexplode + avg — both
    * shuffle-light and size-independent of the corpus.
    *
    * At real scale the cell assignment would be computed once and the
    * corpus written partitioned by cell (partition pruning turns
    * nProbe into a scan-time cut, same trick as [[bucketedTopK]]'s
    * bucket files).
    */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, nCentroids: Int = 16, nProbe: Int = 4,
      iters: Int = 2): DataFrame = {
    require(nCentroids >= 1 && nProbe >= 1 && iters >= 0)
    // the refinement loop + final scan make iters+2 passes over the
    // corpus — cache the two columns we touch for the duration
    val work = emb.select(col(idCol), col(vecCol)).cache()
    val centroids = trainCentroids(work, idCol, vecCol, nCentroids, iters)
    val probes = nearestCentroids(centroids, query, nProbe)
    val q = typedlit(query)
    val cos = VectorOps.cosineFor(work, vecCol)
    val result = work.select(col(idCol), col(vecCol),
        cellColumn(col(vecCol), centroids).as("cell"))
      .filter(col("cell").isin(probes: _*))
      .select(col(idCol), cos(col(vecCol), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
      .localCheckpoint() // materialize before dropping the cache
    work.unpersist()
    result
  }

  /** Column form of [[nearestCell]], dispatched to the native
    * codegen'd `graft_argmin_cell` kernel (fused argmin loop inside
    * whole-stage codegen — replaces the last Scala UDF on a
    * corpus-sized hot path; same fold order and tie rule, asserted
    * kernel-vs-UDF equal in VectorOpsSpec). The centroid table rides
    * as a literal — the broadcast-small side of the assignment, k×dim
    * doubles.
    */
  def cellColumn(vec: Column, cs: Array[Array[Double]]): Column =
    call_function("graft_argmin_cell", vec.cast("array<float>"),
      typedlit(cs.map(_.toSeq).toSeq))

  /** Squared L2 distance of a float-vector column to one literal
    * centroid (native `graft_l2sq` kernel).
    */
  def sqDistColumn(vec: Column, centroid: Array[Double]): Column =
    call_function("graft_l2sq", vec.cast("array<float>"),
      typedlit(centroid.toSeq))

  private def l2sq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Index of the nearest centroid (L2, ties by index) — the cell
    * assignment function, shared by the per-call path and
    * [[IvfIndex]].
    */
  def nearestCell(cs: Array[Array[Double]])(v: Seq[Float]): Int = {
    var best = 0; var bestD = Double.MaxValue
    val arr = new Array[Double](v.length)
    var i = 0
    while (i < v.length) { arr(i) = v(i).toDouble; i += 1 }
    var c = 0
    while (c < cs.length) {
      val d = l2sq(cs(c), arr)
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** The nProbe cell ids nearest the query (L2, ties by index). */
  def nearestCentroids(centroids: Array[Array[Double]], query: Seq[Float],
      nProbe: Int): Seq[Int] = {
    val qa = query.map(_.toDouble).toArray
    centroids.zipWithIndex
      .sortBy { case (c, i) => (l2sq(c, qa), i) }
      .take(nProbe).map(_._2).toSeq
  }

  /** Deterministic k-means centroids: hash-ordered corpus sample init,
    * `iters` Lloyd rounds with decimal-exact per-cell means (double avg
    * is IEEE754 order-dependent; drifting centroids would silently
    * change probed cells under AQE re-plans). Per-cell means are `dim`
    * avg aggregates over element_at — one partial-agg row per cell, no
    * corpus×dim explode. Only nCentroids×dim values ever reach the
    * driver.
    */
  def trainCentroids(work: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, iters: Int): Array[Array[Double]] = {
    var centroids: Array[Array[Double]] = work
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(nCentroids)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dim = centroids.headOption.map(_.length).getOrElse(0)
    for (_ <- 0 until iters if dim > 0) {
      val cs = centroids
      def dmean(i: Int) = avg(element_at(col(vecCol), i + 1)
        .cast(org.apache.spark.sql.types.DecimalType(38, 20))).as(s"m$i")
      val means = work
        .groupBy(cellColumn(col(vecCol), cs).as("cell"))
        .agg(dmean(0), (1 until dim).map(dmean): _*)
        .collect()
        .map(r => r.getInt(0) ->
          (0 until dim).map(i => r.getDecimal(i + 1).doubleValue()).toArray).toMap
      centroids = centroids.indices
        .map(i => means.getOrElse(i, centroids(i))).toArray // empty cell keeps its centroid
    }
    centroids
  }

  /** Deterministic Lloyd k-means ASSIGNMENTS with cross-engine-exact
    * arithmetic — the oracle-parity clustering path
    * ([[trainCentroids]] stays the hash-seeded variant IVF/PQ build
    * on; its decimal AVG and xxhash init cannot be restated in
    * portable SQL):
    *
    *  - init = the k lowest-id vectors (ORDER BY id LIMIT k);
    *  - per-cell means = decimal SUM / COUNT, one final cast to
    *    double — decimal sums are exact and order-independent under
    *    partial aggregation, where a double sum is IEEE754
    *    order-dependent and another engine's decimal AVG may degrade
    *    to a double accumulator;
    *  - squared-L2 folds dimensions in index order; argmin ties
    *    break toward the lower cell index; empty cells keep their
    *    previous centroid.
    *
    * Returns (idCol, cluster, sqdist) for every input row. Only
    * k×dim values reach the driver per round; assignment is a
    * broadcast argmin over the corpus.
    */
  /** The centroid-training half of [[kmeansAssignments]], exposed so
    * a FROZEN-layout consumer (incremental semantic classify: train
    * on the corpus once, assign arriving batches at the same
    * centroids) can reuse the exact oracle-parity arithmetic.
    */
  def kmeansCentroids(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): Array[Array[Double]] = {
    require(k >= 1 && iters >= 0)
    import org.apache.spark.sql.types.DecimalType
    val work = emb.select(col(idCol), col(vecCol)).cache()
    var centroids: Array[Array[Double]] = work.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dim = centroids.headOption.map(_.length).getOrElse(0)
    for (_ <- 0 until iters if dim > 0) {
      val cs = centroids
      def dsum(i: Int) = sum(element_at(col(vecCol), i + 1)
        .cast(DecimalType(38, 20))).as(s"s$i")
      val rows = work.groupBy(cellColumn(col(vecCol), cs).as("cell"))
        .agg(count(lit(1)).as("n"), (0 until dim).map(dsum): _*)
        .collect()
      val means = rows.map { r =>
        val n = r.getLong(1).toDouble
        r.getInt(0) ->
          (0 until dim).map(i => r.getDecimal(i + 2).doubleValue() / n).toArray
      }.toMap
      centroids = centroids.indices
        .map(i => means.getOrElse(i, centroids(i))).toArray
    }
    work.unpersist()
    centroids
  }

  def kmeansAssignments(emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    // final assignment: the native argmin kernel plus one graft_l2sq
    // against the matched centroid (the centroid table is a literal,
    // so element_at on it stays inside whole-stage codegen)
    val cs = kmeansCentroids(emb, idCol, vecCol, k, iters)
    val csLit = typedlit(cs.map(_.toSeq).toSeq)
    emb.select(col(idCol),
        cellColumn(col(vecCol), cs).as("cluster"),
        col(vecCol))
      .select(col(idCol), col("cluster"),
        call_function("graft_l2sq", col(vecCol).cast("array<float>"),
          element_at(csLit, col("cluster") + 1)).as("sqdist"))
  }

  /** All-pairs exact cosine for a (small, broadcastable) query set
    * against the corpus: query rows are broadcast, corpus streams.
    */
  def batchTopK(emb: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // relational double path if EITHER side is double-typed
    val cos =
      if (VectorOps.isDoubleVec(emb, vecCol) ||
          VectorOps.isDoubleVec(queries, qVecCol))
        VectorOps.cosineRelational _
      else VectorOps.cosine _
    val joined = emb.crossJoin(broadcast(
      queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"))))
      .select(col("query_id"), col(idCol),
        cos(col(vecCol), col("qv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col(idCol))
    joined.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }
}
