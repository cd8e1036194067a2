package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational question-plan construction (reference O8,
  * syllabus_ai_graph.py:92-144). The reference asks an LLM to emit a
  * plan under hard constraints; the constraints themselves are
  * relational, so the engine builds the plan declaratively and
  * reserves the model seam for content generation only:
  *
  *  - ≥ `perSubtopic` questions per subtopic (prompt constraint :112);
  *  - balanced easy/medium/hard (:110) — difficulty cycles with
  *    position, so counts per difficulty differ by at most one;
  *  - unique question ids (:113) — `q-<row_number>` over a global
  *    order on (topic, subtopic, position);
  *  - a `concept_area` per question (:114) — cycled from the
  *    subtopic's key_concepts;
  *  - empty subtopics ⇒ empty plan (:94-96) — holds trivially.
  *
  * Scale: posexplode is a narrow op; the only shuffle is the
  * row_number window. For plan-sized data (thousands of rows per
  * topic) the global window is fine; at corpus scale partition the
  * id by topic instead (`idsPerTopic = true`) so ids are
  * `<topic_seq>-<n>` and the window partitions by topic — no global
  * funnel.
  */
object Planner {
  private val difficulties = Seq("easy", "medium", "hard")

  /** Build a plan from a subtopics Dataset. One output row per
    * planned question, `status = "planned"`.
    */
  def plan(subtopics: Dataset[Subtopic], perSubtopic: Int = 9,
      idsPerTopic: Boolean = false): Dataset[PlannedQuestion] = {
    val spark = subtopics.sparkSession
    import spark.implicits._
    require(perSubtopic >= 1, "perSubtopic must be >= 1")
    val exploded = subtopics.toDF()
      .select(col("topic_title"), col("subtopic_name"), col("key_concepts"))
      .select(col("*"), posexplode(array((0 until perSubtopic).map(lit): _*)).as(Seq("pos", "_drop")))
      .drop("_drop")
    val w =
      if (idsPerTopic) Window.partitionBy(col("topic_title"))
        .orderBy(col("subtopic_name"), col("pos"))
      else Window.orderBy(col("topic_title"), col("subtopic_name"), col("pos"))
    // the per-topic prefix is the TITLE itself, not a hash of it: a
    // 32-bit hash collides across topics at corpus scale (~50% by 77k
    // topics) and would break the documented id-uniqueness invariant;
    // the title is already the window partition key, so title+number
    // is unique by construction
    val idPrefix =
      if (idsPerTopic) concat(lit("q-"), col("topic_title"), lit("-"))
      else lit("q-")
    exploded
      .withColumn("question_id", concat(idPrefix, row_number().over(w).cast("string")))
      .withColumn("difficulty",
        element_at(array(difficulties.map(lit): _*), (col("pos") % 3 + 1).cast("int")))
      .withColumn("concept_area",
        when(size(col("key_concepts")) > 0,
          element_at(col("key_concepts"), (col("pos") % greatest(size(col("key_concepts")), lit(1)) + 1).cast("int")))
          .otherwise(col("subtopic_name")))
      .select(col("question_id"), col("topic_title").as("topic"),
        col("subtopic_name").as("subtopic"), col("difficulty"),
        col("concept_area"), lit("planned").as("status"))
      .as[PlannedQuestion]
  }

  /** Reference difficulty-balance check (syllabus_ai_graph.py:110) as
    * a reusable assertion: per (topic, subtopic), max and min count
    * across difficulties differ by ≤ 1.
    */
  def difficultyBalance(plan: Dataset[PlannedQuestion]): DataFrame =
    plan.groupBy(col("topic"), col("subtopic"), col("difficulty")).count()
      .groupBy(col("topic"), col("subtopic"))
      .agg((max(col("count")) - min(col("count"))).as("imbalance"))
}
