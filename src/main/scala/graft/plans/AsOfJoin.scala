package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native **as-of join** — the whole-operator (c)-tier component of the
  * engine: a custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`,
  * registered through `SparkSessionExtensions` (SURVEY §2.7 / the brief's
  * canonical "operator Spark lacks").
  *
  * Semantics: for every left row, attach the single right row with equal
  * join keys and the greatest order-tuple ≤ the left row's order-tuple
  * (backward as-of; `orderExprs` are compared lexicographically, so a
  * composite (ts, id) gives the deterministic tie convention the oracle
  * uses). Unmatched left rows keep nulls — a left-outer temporal join.
  *
  * Why a custom operator instead of composition: the union-window trick
  * ([[graft.queries.Relational.asofJoin]]) needs both sides to fit one
  * schema and materializes every right column through a last-non-null
  * window per column; an inequality join formulation is a per-key cross
  * product. This exec asks Catalyst for hash co-partitioning on the keys
  * and (key, order) sort WITHIN partitions — the same machinery
  * sort-merge join uses, satisfied by one exchange per side — then
  * merge-walks the two sorted iterators once: O(left + right) per
  * partition, state = ONE held right row, no per-key buffering, no
  * cross product. At 100 TB that is the minimal possible data movement
  * for the operator (both sides move once, pre-aggregated nothing). */
/** Match direction: backward = greatest right order-tuple ≤ the left's
  * (the classic as-of); forward = smallest right order-tuple ≥ the
  * left's; nearest = whichever of the two candidates has the smaller
  * first-order-column gap, backward winning ties (pandas
  * `merge_asof(direction=...)` family). */
sealed trait AsOfDirection extends Serializable
case object AsOfBackward extends AsOfDirection
case object AsOfForward extends AsOfDirection
case object AsOfNearest extends AsOfDirection

final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftOrder: Seq[Expression],
    rightOrder: Seq[Expression],
    direction: AsOfDirection = AsOfBackward,
    tolerance: Option[Long] = None) extends BinaryNode {

  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs matching, non-empty key lists")
  require(leftOrder.length == rightOrder.length && leftOrder.nonEmpty,
    "as-of join needs matching, non-empty order-expression lists")
  // the orderings and the tolerance gap reader are built from LEFT types
  // but applied to right-side projections too — an int-vs-long mismatch
  // would silently compare wrong bytes instead of failing analysis
  // (dataType is only legal on resolved expressions, hence the guard)
  if ((leftKeys ++ rightKeys ++ leftOrder ++ rightOrder).forall(_.resolved)) {
    require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
      s"as-of join key types must match: " +
        s"${leftKeys.map(_.dataType)} vs ${rightKeys.map(_.dataType)}")
    require(leftOrder.map(_.dataType) == rightOrder.map(_.dataType),
      s"as-of join order-expression types must match: " +
        s"${leftOrder.map(_.dataType)} vs ${rightOrder.map(_.dataType)}")
  }
  require((tolerance.isEmpty && direction != AsOfNearest) ||
      AsOfJoinPlan.longBacked(leftOrder.head.dataType),
    "as-of tolerance/nearest needs a long-backed first order column " +
      "(long/int/timestamp/date) to measure the gap")

  // right side is match-or-null (attributes turn nullable); its key
  // columns are dropped from the output — they are equal to the left's or
  // null, and keeping them would shadow the left's names (a USING-join
  // style coalesce, resolved at the plan level)
  override def output: Seq[Attribute] =
    left.output ++ AsOfJoinPlan.rightPayload(right.output, rightKeys)
      .map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  /** Types whose InternalRow representation is an integral the tolerance
    * check can subtract: long, int, timestamp (µs), date (days). */
  private[plans] def longBacked(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.TimestampType | org.apache.spark.sql.types.TimestampNTZType |
         org.apache.spark.sql.types.DateType => true
    case _ => false
  }

  /** Right-side output minus the join-key attributes. */
  private[plans] def rightPayload(rightOutput: Seq[Attribute],
      rightKeys: Seq[Expression]): Seq[Attribute] = {
    val keyIds = rightKeys.collect { case a: Attribute => a.exprId }.toSet
    rightOutput.filterNot(a => keyIds.contains(a.exprId))
  }
}

final case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftOrder: Seq[Expression],
    rightOrder: Seq[Expression],
    direction: AsOfDirection,
    tolerance: Option[Long]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ AsOfJoinPlan.rightPayload(right.output, rightKeys)
      .map(_.withNullability(true))

  // hash co-partition both sides on the full key tuple (the shuffled-join
  // contract: EnsureRequirements plans one exchange per side, or none when
  // an upstream operator already partitioned compatibly)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // sort within partitions by (keys, order): the merge walk's only demand
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys ++ leftOrder).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
    (rightKeys ++ rightOrder).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputOrdering: Seq[SortOrder] = left.outputOrdering
  override def outputPartitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyTypes = leftKeys.map(_.dataType)
    val lOrdTypes = leftOrder.map(_.dataType)
    val numRightFields = right.output.length
    val outputAttrs = output

    val lk = leftKeys
    val rk = rightKeys
    val lo = leftOrder
    val ro = rightOrder
    val lOut = left.output
    val rOut = right.output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lOrdProj = UnsafeProjection.create(lo, lOut)
      val rOrdProj = UnsafeProjection.create(ro, rOut)
      val keyOrdering = RowOrdering.createNaturalAscendingOrdering(lKeyTypes)
      val ordOrdering = RowOrdering.createNaturalAscendingOrdering(lOrdTypes)
      val nullRight = new GenericInternalRow(numRightFields)
      val joined = new JoinedRow
      // the joined row carries ALL right fields; the projection drops the
      // right-side key columns to produce the declared output
      val resultProj = UnsafeProjection.create(outputAttrs,
        lOut ++ rOut.map(_.withNullability(true)))

      // nearest consumes like backward (holds the ≤ candidate) and then
      // arbitrates against the peeked ≥ candidate by first-order gap
      val consumeKeep = direction != AsOfForward
      val tolValue = tolerance.getOrElse(Long.MaxValue)
      // first-order-column gap, in the column's integral representation
      // (µs for timestamps, days for dates); IntegerType reads as int
      val firstOrdIsInt =
        lo.head.dataType == org.apache.spark.sql.types.IntegerType ||
        lo.head.dataType == org.apache.spark.sql.types.DateType
      def ord0(r: InternalRow): Long =
        if (firstOrdIsInt) r.getInt(0).toLong else r.getLong(0)
      def withinTol(lOrd: InternalRow, mOrd: InternalRow, backward: Boolean): Boolean =
        tolerance.isEmpty || {
          val gap = if (backward) ord0(lOrd) - ord0(mOrd) else ord0(mOrd) - ord0(lOrd)
          gap <= tolValue
        }

      new Iterator[InternalRow] {
        // single-row as-of state: the last right row consumed (copied out
        // of the iterator's reused buffer) and its key — backward only;
        // forward matches the PEEKED row (the first not-yet-consumed one)
        private var held: InternalRow = _
        private var heldKey: InternalRow = _
        private var peeked: InternalRow = _
        private def peek(): InternalRow = {
          if (peeked == null && rIter.hasNext) peeked = rIter.next()
          peeked
        }
        private def consumePeeked(keep: Boolean): Unit = {
          if (keep) {
            held = peeked.copy()
            heldKey = rKeyProj(held).copy()
          }
          peeked = null
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lOrd = lOrdProj(l)
          // backward/nearest: consume right while (key, order) ≤ the left
          //   row, holding the last consumed row of the same key;
          // forward: consume right while strictly before the left row;
          // after the walk, `held` is the ≤ candidate and `peeked` the ≥
          //   candidate (first not-yet-consumed) — direction picks
          var continue = true
          while (continue && peek() != null) {
            val kCmp = keyOrdering.compare(rKeyProj(peeked), lKey)
            if (kCmp < 0) consumePeeked(keep = false)
            else if (kCmp == 0) {
              val oCmp = ordOrdering.compare(rOrdProj(peeked), lOrd)
              if (oCmp < 0 || (consumeKeep && oCmp == 0)) consumePeeked(keep = consumeKeep)
              else continue = false
            } else continue = false
          }
          def bwdCand: InternalRow =
            if (held != null && keyOrdering.compare(heldKey, lKey) == 0 &&
              ordOrdering.compare(rOrdProj(held), lOrd) <= 0) held
            else null
          def fwdCand: InternalRow =
            if (peeked != null && keyOrdering.compare(rKeyProj(peeked), lKey) == 0) peeked
            else null
          val m = direction match {
            case AsOfBackward =>
              val c = bwdCand
              if (c != null && withinTol(lOrd, rOrdProj(c), backward = true)) c else nullRight
            case AsOfForward =>
              val c = fwdCand
              if (c != null && withinTol(lOrd, rOrdProj(c), backward = false)) c else nullRight
            case AsOfNearest =>
              val b = bwdCand
              val f = fwdCand
              val gb = if (b == null) Long.MaxValue else ord0(lOrd) - ord0(rOrdProj(b))
              val gf = if (f == null) Long.MaxValue else ord0(rOrdProj(f)) - ord0(lOrd)
              val bOk = b != null && gb <= tolValue
              val fOk = f != null && gf <= tolValue
              if (bOk && (!fOk || gb <= gf)) b
              else if (fOk) f
              else nullRight
          }
          resultProj(joined(l, m))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: [[AsOfJoinPlan]] → [[AsOfJoinExec]]. Injected via
  * `GraftExtensions` (`injectPlannerStrategy`) or
  * `spark.experimental.extraStrategies` on a live session. */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lo, ro, dir, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lo, ro, dir, tol) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {

  /** Build the as-of join over two DataFrames. Key/order columns are
    * resolved by NAME against each side (the node is constructed from the
    * analyzed child plans, so the analyzer sees a fully-resolved node).
    * `order` columns compare lexicographically; pass (ts, unique_id) for a
    * deterministic tie convention. */
  def apply(spark: SparkSession, left: DataFrame, right: DataFrame,
      on: Seq[String], leftOrder: Seq[String], rightOrder: Seq[String],
      direction: AsOfDirection = AsOfBackward,
      tolerance: Option[Long] = None): DataFrame = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    // live-session twin of GraftExtensions.injectOptimizerRule: without
    // these, a Filter/Project above the node blocks pushdown and pruning
    if (!spark.experimental.extraOptimizations.contains(AsOfPushdownRule)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations ++
          Seq(AsOfPushdownRule, AsOfColumnPruningRule)
    }
    val lPlan = ColumnBridge.logicalPlan(left)
    // Re-alias every right column (same names, fresh exprIds): both sides
    // often derive from the same base relation, and duplicate exprIds in
    // the combined output would mis-bind the result projection. Spark's
    // analyzer does this for its own Join nodes; a custom node does it
    // itself.
    val rPlan = ColumnBridge.logicalPlan(
      right.select(right.columns.map(c =>
        org.apache.spark.sql.functions.col(c).as(c)): _*))
    def resolve(plan: LogicalPlan, name: String): Expression =
      plan.output.find(a => a.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"as-of join: column $name not in [${plan.output.map(_.name).mkString(", ")}]"))
    val node = AsOfJoinPlan(lPlan, rPlan,
      on.map(resolve(lPlan, _)), on.map(resolve(rPlan, _)),
      leftOrder.map(resolve(lPlan, _)), rightOrder.map(resolve(rPlan, _)),
      direction, tolerance)
    ColumnBridge.dataFrame(spark, node)
  }

  /** Column-free convenience: same keys and order column names on both
    * sides. */
  def apply(spark: SparkSession, left: DataFrame, right: DataFrame,
      on: Seq[String], order: Seq[String]): DataFrame =
    apply(spark, left, right, on, order, order)
}
