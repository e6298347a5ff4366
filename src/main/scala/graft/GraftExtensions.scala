package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.{BoundedTopK, FloatVecDot, SortedLongIntersectCount, WinnowFingerprint}

/** Session-extension entry point: makes graft's native expressions
  * available as SQL functions. Two routes:
  *
  *  - config `spark.sql.extensions=graft.GraftExtensions` (or
  *    `.withExtensions(new GraftExtensions)`) at session build — the
  *    idiomatic deployment;
  *  - [[GraftExtensions.register]] on a live session, for harnesses
  *    (like the driver's) that construct the session themselves.
  *
  * SQL surface:
  *  - `graft_vec_dot(a, b)` — codegen'd array<float> dot product
  *  - `graft_topk(sortStruct, k)` — bounded top-k aggregate
  *  - `graft_winnow(text, k, w)` — winnowing fingerprint set
  *  - `graft_sorted_intersect(a, b)` — |A∩B| of two sorted bigint arrays
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(e.injectFunction)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_vec_dot"),
      info("graft_vec_dot", "graft_vec_dot(a, b) - double dot product of two float arrays"),
      (exprs: Seq[Expression]) => FloatVecDot(exprs(0), exprs(1))),
    (FunctionIdentifier("graft_topk"),
      info("graft_topk", "graft_topk(sortStruct, k) - ascending array of the k smallest structs"),
      (exprs: Seq[Expression]) => exprs(1) match {
        case Literal(k: Int, _) => BoundedTopK(exprs(0), k)
        case other => throw new IllegalArgumentException(
          s"graft_topk k must be an integer literal, got $other")
      }),
    (FunctionIdentifier("graft_winnow"),
      info("graft_winnow",
        "graft_winnow(text, k, w) - distinct winnowing minima of xxhash64 char k-grams over windows of w"),
      (exprs: Seq[Expression]) => (exprs(1), exprs(2)) match {
        case (Literal(k: Int, _), Literal(w: Int, _)) => WinnowFingerprint(exprs(0), k, w)
        case other => throw new IllegalArgumentException(
          s"graft_winnow k and w must be integer literals, got $other")
      }),
    (FunctionIdentifier("graft_sorted_intersect"),
      info("graft_sorted_intersect",
        "graft_sorted_intersect(a, b) - intersection size of two ascending-sorted bigint arrays"),
      (exprs: Seq[Expression]) => SortedLongIntersectCount(exprs(0), exprs(1))))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, fnInfo, builder) =>
      org.apache.spark.sql.graftbridge.ColumnBridge
        .registerFunction(spark, id, fnInfo, builder)
    }
}
