package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The native graft_dot / graft_cosine kernels must be bit-identical
  * to the relational (zip_with + aggregate) formulation — same
  * sequential fold order — including the null/edge semantics.
  */
class VectorOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("native dot/cosine == relational, bit-for-bit, on the corpus") {
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding")).head.getSeq[Float](0)
    val both = emb.select(col("vec_id"),
      VectorOps.dot(col("embedding"), typedlit(q)).as("nd"),
      VectorOps.dotRelational(col("embedding"), typedlit(q)).as("rd"),
      VectorOps.cosine(col("embedding"), typedlit(q)).as("nc"),
      VectorOps.cosineRelational(col("embedding"), typedlit(q)).as("rc"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      // bit-identical, not approximately equal
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"dot mismatch at ${r.get(0)}")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(4)), s"cosine mismatch at ${r.get(0)}")
    }
  }

  test("array<double> inputs are accepted (narrowed to float like the old zip_with form)") {
    val d = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val out = d.select(
      VectorOps.dot(col("a"), col("b")).as("dot"),
      VectorOps.cosine(col("a"), col("b")).as("cos")).head()
    assert(out.getDouble(0) == 32.0)
    assert(math.abs(out.getDouble(1) - 0.9746318461970762) < 1e-12)
  }

  test("edge semantics: null array, null element, length mismatch, zero norm") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Array(3.0f, 4.0f)),   // plain
      (2L, null.asInstanceOf[Array[Float]], Array(1.0f, 2.0f)), // null array
      (3L, Array(0.0f, 0.0f), Array(1.0f, 2.0f)),   // zero norm
      (4L, Array(1.0f), Array(1.0f, 2.0f))          // length mismatch
    ).toDF("id", "a", "b")
    val rows = df.select(col("id"),
      VectorOps.dot(col("a"), col("b")).as("d"),
      VectorOps.cosine(col("a"), col("b")).as("c")).orderBy("id").collect()
    assert(rows(0).getDouble(1) == 11.0)
    assert(math.abs(rows(0).getDouble(2) - 11.0 / (math.sqrt(5.0) * math.sqrt(25.0))) < 1e-12)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
    assert(rows(2).getDouble(1) == 0.0 && rows(2).isNullAt(2)) // zero-norm cosine -> null
    assert(rows(3).isNullAt(1) && rows(3).isNullAt(2))         // mismatch -> null

    // null ELEMENT inside the array -> null (zip_with parity)
    val withNullElem = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS d, " +
        "graft_cosine(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS c").head
    assert(withNullElem.isNullAt(0) && withNullElem.isNullAt(1))
  }

  test("kernels run inside whole-stage codegen") {
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding")).head.getSeq[Float](0)
    val plan = emb.select(VectorOps.cosine(col("embedding"), typedlit(q)).as("c"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected whole-stage codegen, got:\n$plan")
  }

  test("graft_argmin_cell == driver nearestCell UDF on the corpus; l2sq matches; codegen'd") {
    import graft.similarity.Similarity
    val emb = graft.Tables.embeddings(spark, sf)
    // deliberately awkward centroids (ties possible, unbalanced cells):
    // the 5 lowest-id corpus vectors as doubles
    val cs = emb.orderBy("vec_id").limit(5).select(col("embedding"))
      .collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val udfAssign = udf(Similarity.nearestCell(cs) _)
    val csLit = typedlit(cs.map(_.toSeq).toSeq)
    val rows = emb.select(col("vec_id"),
      Similarity.cellColumn(col("embedding"), cs).as("kc"),
      udfAssign(col("embedding")).as("uc"),
      call_function("graft_l2sq", col("embedding").cast("array<float>"),
        element_at(csLit, Similarity.cellColumn(col("embedding"), cs) + 1))
        .as("kd"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"argmin mismatch at ${r.get(0)}")
      assert(r.getDouble(3) >= 0.0)
    }
    // the whole assignment (argmin + distance) stays in one codegen span
    val plan = emb.select(Similarity.cellColumn(col("embedding"), cs).as("c"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"expected whole-stage codegen, got:\n$plan")
    // null/edge contract: empty centroid table, length mismatch -> null
    val edge = spark.sql(
      "SELECT graft_argmin_cell(array(CAST(1.0 AS FLOAT)), " +
        "CAST(array() AS ARRAY<ARRAY<DOUBLE>>)) AS a, " +
        "graft_argmin_cell(array(CAST(1.0 AS FLOAT)), " +
        "array(array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)))) AS b, " +
        "graft_l2sq(array(CAST(1.0 AS FLOAT)), " +
        "array(CAST(3.0 AS DOUBLE))) AS d").head
    assert(edge.isNullAt(0) && edge.isNullAt(1))
    assert(edge.getDouble(2) == 4.0)
  }
}
