package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, Unevaluable, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Native backward as-of join — the full custom-operator stack
  * (SURVEY.md §4.2 route (c)): marker function → analyzer-visible
  * condition → optimizer [[Rule]] rewriting the Join into a custom
  * [[BinaryNode]] → [[Strategy]] planning a custom [[BinaryExecNode]]
  * whose distribution/ordering REQUIREMENTS make EnsureRequirements
  * insert exactly one hash exchange + one sort per side, after which
  * the merge itself is a streaming single pass.
  *
  * Why a physical operator when the union+window composition
  * ([[graft.operators.AsOfJoin.backward]]) already works: the
  * composition materializes left∪right through one shuffle and runs a
  * window (full sort + frame evaluation) over the COMBINED stream —
  * the right side pays the left side's width (null-padded columns)
  * through the exchange. The native plan shuffles each side at its
  * own width, sorts each side separately (the smaller right side
  * sorts cheaply), and streams — no padded union ever exists. Same
  * semantics, asserted equal in AsOfJoinNativeSpec and against
  * DuckDB's ASOF JOIN (q_asof_native).
  *
  * Semantics: for each left row, the LAST right row (same key) with
  * `r.time <= l.time`; no match ⇒ right columns null. Ties on
  * (key, time) on the right are partition-order-dependent — dedup the
  * right side first (same caveat as the composed form and DuckDB).
  *
  * Keys and times must be LongType attributes (the API wrapper
  * materializes casts as columns first) — this keeps the merge loop
  * allocation-free primitive comparisons instead of generic ordering.
  */
final case class AsOfMarkerExpr(children: Seq[Expression])
    extends Unevaluable {
  // the marker never survives to execution: AsOfJoinRewriteRule
  // replaces the Join carrying it; reaching eval is a registration bug
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AsOfMarkerExpr =
    copy(children = newChildren)
}

/** Logical backward as-of join: left enriched with right's columns
  * (nullable) for the latest right row at-or-before the left time.
  */
final case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Rewrites `l.join(r, graft_asof_marker(lk, lt, rk, rt))` into
  * [[AsOfJoinNode]]. The marker's four arguments are classified by
  * which side's output they resolve against, so argument order in the
  * SQL surface doesn't matter beyond (key, time) per side.
  *
  * Injected as a POST-HOC RESOLUTION rule (not an optimizer rule):
  * at analysis time the Join still has the join type the user wrote,
  * so the LeftOuter check below is reliable — in the optimizer,
  * EliminateOuterJoin (which runs earlier in the same batch as
  * extension rules) can flip left_outer→inner under a null-intolerant
  * filter on right columns, turning a well-formed query into a
  * confusing abort. Rewriting during analysis also makes the Dataset
  * schema come from [[AsOfJoinNode.output]] directly (right side
  * nullable), so downstream codegen nullability is consistent by
  * construction.
  */
object AsOfJoinRewriteRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case j @ Join(l, r, joinType, Some(AsOfMarkerExpr(args)), _) if j.resolved =>
      // LeftOuter ONLY: the exec emits null right columns on misses;
      // an inner-join schema would mark them non-nullable and make
      // downstream codegen read those nulls as 0/empty (silent wrong
      // results). Checked at analysis, where the user's declared join
      // type is still visible.
      require(joinType == org.apache.spark.sql.catalyst.plans.LeftOuter,
        s"graft_asof_marker requires a left_outer join (got $joinType): " +
          "write l.join(r, marker, \"left_outer\") or use AsOfJoin.backwardNative")
      require(args.length == 4,
        "graft_asof_marker(leftKey, leftTime, rightKey, rightTime)")
      val leftSide = args.filter(_.references.subsetOf(l.outputSet))
      val rightSide = args.filter(_.references.subsetOf(r.outputSet))
      require(leftSide.length == 2 && rightSide.length == 2,
        s"as-of marker needs (key, time) from each side, got $j")
      AsOfJoinNode(l, r, leftSide(0), leftSide(1), rightSide(0), rightSide(1))
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

/** Physical sorted-merge backward as-of join.
  *
  * requiredChildDistribution/-Ordering declare (hash by key, sort by
  * (key, time)) per side; EnsureRequirements materializes them, so
  * doExecute sees co-partitioned, sorted inputs and runs a pure
  * streaming merge: the right cursor only ever advances, holding ONE
  * buffered row (the current best match) — O(1) memory per partition
  * beyond the iterators themselves, no per-key grouping buffer.
  */
final case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression)
    extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)) ::
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) :: Nil

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  private def ordinalOf(e: Expression, attrs: Seq[Attribute], side: String): Int =
    e match {
      case a: AttributeReference =>
        val i = attrs.indexWhere(_.exprId == a.exprId)
        require(i >= 0, s"$side as-of column ${a.name} not in child output")
        require(a.dataType == LongType,
          s"$side as-of column ${a.name} must be BIGINT (materialize the cast)")
        i
      case other => throw new IllegalArgumentException(
        s"as-of $side key/time must be a plain column, got $other")
    }

  override protected def doExecute(): RDD[InternalRow] = {
    val lkOrd = ordinalOf(leftKey, left.output, "left")
    val ltOrd = ordinalOf(leftTime, left.output, "left")
    val rkOrd = ordinalOf(rightKey, right.output, "right")
    val rtOrd = ordinalOf(rightTime, right.output, "right")
    val rightWidth = right.output.length
    val outputAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val toUnsafe = UnsafeProjection.create(outputAttrs, outputAttrs)

      new Iterator[InternalRow] {
        private var lastMatch: InternalRow = null
        private var lastMatchKey: Long = 0L
        private var pending: InternalRow = null // lookahead right row

        private def pendingValid(lk: Long, lt: Long): Boolean = {
          if (pending == null && rIter.hasNext) pending = rIter.next()
          if (pending == null) return false
          if (pending.isNullAt(rkOrd) || pending.isNullAt(rtOrd)) {
            // unmatched-able right row (nulls sort first): discard
            pending = null
            return pendingValid(lk, lt)
          }
          val rk = pending.getLong(rkOrd)
          val rt = pending.getLong(rtOrd)
          rk < lk || (rk == lk && rt <= lt)
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          if (l.isNullAt(lkOrd) || l.isNullAt(ltOrd)) {
            toUnsafe(joined(l, nullRight))
          } else {
            val lk = l.getLong(lkOrd)
            val lt = l.getLong(ltOrd)
            while (pendingValid(lk, lt)) {
              lastMatch = pending.copy()
              lastMatchKey = pending.getLong(rkOrd)
              pending = null
            }
            if (lastMatch != null && lastMatchKey == lk) {
              toUnsafe(joined(l, lastMatch))
            } else {
              toUnsafe(joined(l, nullRight))
            }
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
