package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the time-series operator Spark has no native
  * plan for (SURVEY.md §2 "custom operators" mandate): each left row
  * picks the latest right row with `r.ts <= l.ts` within the same key.
  *
  * Implementation is the scalable union-window formulation, NOT a
  * range join: tag right rows 0 and left rows 1, union, and run
  * `last(match-struct) ignore nulls` over
  * `(partition by key order by ts, tag rows unbounded preceding)` —
  * at equal timestamps the right row sorts first, so `>=` matches.
  * One hash shuffle + per-key sort total, the same cost as a window
  * aggregate; never a per-row backward scan or an O(|L|·|R|)
  * range-condition nested loop. Parallelism = number of keys.
  *
  * DuckDB's `ASOF LEFT JOIN` is the oracle twin (q_asof): identical
  * semantics when right-side (key, ts) are unique — callers should
  * dedup the right side first, since "latest among ties" is otherwise
  * engine-defined.
  */
object AsOfJoin {

  /** Left rows enriched with `asof_ts` (the matched right timestamp)
    * and `asof_<p>` for each right payload column `p`; all null when
    * no earlier right row exists (left-join semantics).
    *
    * @param left      probe side; all its columns survive unchanged
    * @param right     build side; only key, ts, payload are read
    * @param key       equi-join key column name (same name both sides)
    * @param ts        event-time column name (same name both sides)
    * @param payload   right columns to carry over
    * @param tolerance optional max age `l.ts - r.ts` (e.g.
    *                  `expr("INTERVAL 1 HOUR")`); older matches null out
    */
  def backward(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String], tolerance: Option[Column] = None): DataFrame = {
    val side = "_asof_side"
    val outCols = "asof_ts" +: payload.map(p => s"asof_$p")
    require(!left.columns.exists(outCols.contains),
      s"left already has ${outCols.mkString("/")} columns")

    val l = left.withColumn(side, lit(1))
    // the match travels as ONE struct, not per-column: per-column
    // last(ignoreNulls) would skip a NULL payload value back to an
    // OLDER right row while asof_ts stays on the newer one — a
    // mixed-row result. The struct is null exactly for left rows
    // (right rows carry it even when payload fields are null), so one
    // last() picks one whole right row.
    val m = "_asof_m"
    val r = right.select(col(key), col(ts),
      struct(col(ts).as("asof_ts") +:
        payload.map(p => col(p).as(s"asof_$p")): _*).as(m))
      .withColumn(side, lit(0))
    // unionByName fills the columns each side lacks with nulls
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col(side))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn(m, last(col(m), ignoreNulls = true).over(w))
    val pruned = outCols.foldLeft(matched.filter(col(side) === 1)) {
      (df, c) => df.withColumn(c, col(s"$m.$c"))
    }
    val bounded = tolerance match {
      case None => pruned
      case Some(tol) =>
        val ok = col("asof_ts").isNotNull && col("asof_ts") >= col(ts) - tol
        outCols.foldLeft(pruned)((df, c) => df.withColumn(c, when(ok, col(c))))
    }
    bounded.select((left.columns.map(col) ++ outCols.map(col)): _*)
  }

  /** Forward as-of join — the mirror of [[backward]]: each left row
    * picks the EARLIEST right row with `r.ts >= l.ts` within the same
    * key (the "next event after" operator: next maintenance after a
    * failure, next quote after an order). Same scalable union-window
    * formulation, reflected: right rows sort AFTER left rows at equal
    * timestamps (so `>=` includes the same-instant match) and
    * `first(payload) ignore nulls` runs over the FOLLOWING frame.
    * One hash shuffle + per-key sort, like the backward form.
    *
    * Same tie contract as [[backward]]: dedup the right side per
    * (key, ts) first — "earliest among ties" is engine-defined
    * otherwise. `tolerance` bounds the look-AHEAD: matches further
    * than `r.ts - l.ts <= tolerance` null out.
    */
  def forward(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String], tolerance: Option[Column] = None): DataFrame = {
    val side = "_asof_side"
    val outCols = "asof_ts" +: payload.map(p => s"asof_$p")
    require(!left.columns.exists(outCols.contains),
      s"left already has ${outCols.mkString("/")} columns")
    val l = left.withColumn(side, lit(1))
    // single-struct match — same rationale as [[backward]]: one
    // first() picks one whole right row, never a per-column mix
    val m = "_asof_m"
    val r = right.select(col(key), col(ts),
      struct(col(ts).as("asof_ts") +:
        payload.map(p => col(p).as(s"asof_$p")): _*).as(m))
      .withColumn(side, lit(2))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col(side))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = unioned
      .withColumn(m, first(col(m), ignoreNulls = true).over(w))
    val pruned = outCols.foldLeft(matched.filter(col(side) === 1)) {
      (df, c) => df.withColumn(c, col(s"$m.$c"))
    }
    val bounded = tolerance match {
      case None => pruned
      case Some(tol) =>
        val ok = col("asof_ts").isNotNull && col("asof_ts") <= col(ts) + tol
        outCols.foldLeft(pruned)((df, c) => df.withColumn(c, when(ok, col(c))))
    }
    bounded.select((left.columns.map(col) ++ outCols.map(col)): _*)
  }

  /** Native-plan backward as-of join (graft.plans.AsOfJoinExec): same
    * semantics as [[backward]], executed by the custom sorted-merge
    * physical operator instead of the union+window composition — each
    * side shuffles at its own width and the merge is a streaming
    * single pass with O(1) state. Requires [[graft.GraftExtensions]]
    * on the session.
    *
    * `tsToLong` maps the event-time column to an orderable BIGINT.
    * The default keeps MICROSECOND resolution (a plain cast-to-long
    * would truncate to seconds and silently reorder same-second
    * events); TIMESTAMP_NTZ goes through the timestamp cast first
    * (identity wall time under the UTC session).
    */
  def backwardNative(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String],
      tsToLong: Column => Column = c => unix_micros(c.cast("timestamp"))): DataFrame = {
    val outCols = "asof_ts" +: payload.map(p => s"asof_$p")
    require(!left.columns.exists(outCols.contains),
      s"left already has ${outCols.mkString("/")} columns")
    // the physical merge compares BIGINT keys; a string key would cast
    // to null (ANSI off) or throw mid-job (ANSI on) — fail fast here
    // instead; [[backward]] handles arbitrary key types
    Seq(left, right).foreach { side =>
      import org.apache.spark.sql.types._
      val ok = side.schema(key).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
      require(ok,
        s"backwardNative needs an integral key, got $key: " +
          s"${side.schema(key).dataType.sql} " +
          "(use backward, or pre-hash the key to BIGINT)")
    }
    // the physical node wants plain BIGINT columns — materialize the
    // casts as (temporary) attributes on each side
    val l = left
      .withColumn("_asof_lk", col(key).cast("long"))
      .withColumn("_asof_lt", tsToLong(col(ts)))
    val r = right.select(
      col(key).cast("long").as("_asof_rk") +:
        tsToLong(col(ts)).as("_asof_rt") +:
        col(ts).as("asof_ts") +:
        payload.map(p => col(p).as(s"asof_$p")): _*)
    // left_outer: semantically what as-of is, and it makes the ANALYZED
    // schema mark the right columns nullable — the physical operator
    // emits nulls for misses, and downstream codegen must expect them
    // (an inner join's non-nullable schema would read them as 0/empty)
    l.join(r, call_function("graft_asof_marker",
        col("_asof_lk"), col("_asof_lt"), col("_asof_rk"), col("_asof_rt")),
        "left_outer")
      .drop("_asof_lk", "_asof_lt", "_asof_rk", "_asof_rt")
  }
}
