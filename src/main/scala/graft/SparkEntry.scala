package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Analytics, Core, Corpus, Curation, Extended, TrainingData}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2.C core
  * relational surface + the training-data extensions); `oracleSql`
  * holds the DuckDB-equivalent SQL for every query with a portable
  * SQL restatement. Column names/types are normalized on both sides
  * (see queries/Core.scala header for the parity rules).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. Five-table star join with broadcast dimensions → revenue
    * by nation.
    */
  def entry(spark: SparkSession): DataFrame =
    Core.defs("q_join_broadcast")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Core.defs ++ TrainingData.defs ++ Extended.defs ++ Analytics.defs ++
      Curation.defs ++ Corpus.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (MinHash/SimHash/LSH family, multimodal stub) → rows-only check.
    */
  def oracleSql: Map[String, String] =
    Core.oracles ++ TrainingData.oracles ++ Extended.oracles ++
      Analytics.oracles ++ Curation.oracles ++ Corpus.oracles

  /** The query set Bench times: `queries` plus bench-path overrides
    * where the correctness body deliberately does MORE work than the
    * operation a user pays for (q_sim_ivf runs IVF + exact scan +
    * recall gate so the driver can hash-check it; the serving path is
    * build-once / probe-many). Verify always runs `queries` — the
    * overrides never weaken a correctness row.
    */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    queries ++ TrainingData.benchOverrides

  /** SPARK_GRAFT_ONLY=q_a,q_b restriction for Verify/Bench — one
    * parse, and a BLANK value means "no restriction" (a naive
    * split(",") would yield Set("") and silently filter out every
    * query, making an `export SPARK_GRAFT_ONLY=""` run look green
    * while checking nothing).
    */
  def onlyFilter: Option[Set[String]] =
    sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
}
