package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer squared-L2 distance over two `array<long>` columns:
  * Σ (aᵢ − bᵢ)² in wrapping long arithmetic.
  *
  * Why a custom Catalyst Expression instead of `zip_with`+`aggregate`
  * (the [[FloatVecDot]] rationale, applied to the fixed-point serving
  * family): Spark's higher-order functions evaluate their lambda per
  * element with boxed intermediates and no codegen of the inner loop —
  * the r15 profile put the fp IVF/PQ/SQ encode+routing projections at
  * ~7 element-ops/µs on a single task. This expression is a tight
  * primitive loop inside whole-stage codegen with EXACTLY the HOF
  * chain's semantics, which every fp oracle replays:
  *
  *  - equal-length, non-null arrays: left-to-right Σ (a−b)·(a−b) in
  *    wrapping long arithmetic (Catalyst long ops wrap the same way);
  *  - mismatched lengths: `zip_with` pads the shorter side with NULL,
  *    the lambda then yields NULL, and `aggregate`'s acc+NULL poisons
  *    the sum — so the whole result is NULL, reproduced here;
  *  - a NULL element on either side: NULL result, same mechanism;
  *  - two empty arrays: the `aggregate` init, 0L. */
case class LongVecL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_vec_l2 requires two array<bigint> arguments, got $l and $r")
    }

  override def dataType: DataType = LongType

  // can yield NULL even for non-null inputs (length mismatch, null
  // element) — without this override, non-nullable children would make
  // codegen emit `false = true` for the isNull slot and fail to compile
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    if (nx != ny) return null
    var s = 0L
    var i = 0
    while (i < nx) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVecL2 =
    copy(left = newLeft, right = newRight)
}

object LongVecL2 {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongVecL2(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
