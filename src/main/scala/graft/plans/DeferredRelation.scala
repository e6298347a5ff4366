package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}

/** A logical leaf whose result is produced by running `thunk` at
  * EXECUTION time — the deferral shim for table-valued functions whose
  * serving computation is itself a Spark program (driver-side training
  * collects, probe-list collection, nested jobs).
  *
  * Without this, a TVF builder like `graft_ann` has only two options:
  * return the fully-computed plan (so merely ANALYZING the query — every
  * EXPLAIN, every re-analysis — executes Spark jobs, the r13 advisor
  * finding), or give up the fixed-schema contract. This node takes the
  * third path the advisor sketched: analysis sees a leaf with a declared
  * schema and runs zero jobs; the computation runs exactly once, inside
  * `doExecute`, when the enclosing query actually executes — the same
  * driver-side nested-job discipline `AdaptiveSparkPlanExec` and
  * broadcast exchanges already use.
  *
  * The declared `output` is a CONTRACT: the thunk's result is cast to it
  * by the builder (see `GraftExtensions.annPlan`), so the rows that flow
  * upward always match the analysis-time schema. Stats report
  * `defaultSizeInBytes` (unknown — conservatively non-broadcastable;
  * callers joining a deferred result against a large table can still
  * hint `broadcast()` explicitly, which executes the thunk inside the
  * broadcast exchange like any other small side).
  */
case class DeferredRelation(
    name: String,
    override val output: Seq[Attribute],
    @transient thunk: () => DataFrame) extends LeafNode {
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = BigInt(conf.defaultSizeInBytes))
  override def simpleString(maxFields: Int): String =
    s"DeferredRelation $name ${output.map(_.name).mkString("[", ", ", "]")}"
}

/** Physical twin: builds the deferred DataFrame on first execution and
  * hands its `InternalRow` RDD straight up — no copy, no driver
  * materialization of the result itself (only whatever bounded collects
  * the serving computation performs internally). */
case class DeferredRelationExec(
    name: String,
    override val output: Seq[Attribute],
    @transient thunk: () => DataFrame) extends LeafExecNode {
  override protected def doExecute(): RDD[InternalRow] =
    thunk().queryExecution.toRdd
  override def simpleString(maxFields: Int): String =
    s"DeferredRelationExec $name ${output.map(_.name).mkString("[", ", ", "]")}"
}

/** Planner strategy: [[DeferredRelation]] → [[DeferredRelationExec]].
  * Injected via `GraftExtensions` (`injectPlannerStrategy`) or ensured on
  * a live session by the TVF builder itself (the `AsOfJoin.apply`
  * precedent), so the register()-on-a-harness-session path plans it too. */
object DeferredRelationStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case DeferredRelation(name, out, thunk) =>
      DeferredRelationExec(name, out, thunk) :: Nil
    case _ => Nil
  }
}
