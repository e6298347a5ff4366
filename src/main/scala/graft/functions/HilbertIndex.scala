package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Hilbert-curve index of two long coordinates on the
  * 2^bits × 2^bits grid — the codegen'd form of
  * [[graft.operators.Hilbert]]'s runtime `aggregate` fold.
  *
  * Why a custom Catalyst Expression instead of the HOF fold: higher-
  * order functions evaluate their lambda per step with boxed struct
  * intermediates and no whole-stage codegen of the loop body — for a
  * 16-step fold per row on a layout-sort of the whole corpus that is
  * the entire query cost (measured ~3.0 s → sub-second at sf0.1). This
  * generates a tight primitive loop via `doGenCode`, stays inside
  * whole-stage codegen, and computes the IDENTICAL s−1-reflection
  * iteration the DuckDB recursive-CTE oracle runs — HilbertSpec asserts
  * native ≡ fold ≡ driver reference on the exhaustive grid.
  *
  * Inputs are masked to `bits` (matching the oracle's `x & mask`);
  * null in → null out. */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits > 0 && bits <= 16, s"bits must be in [1, 16] (got $bits)")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"graft_hilbert requires two bigint arguments, got $l and $r")
    }

  override def dataType: DataType = LongType

  private val mask = (1L << bits) - 1

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long] & mask
    var y = b.asInstanceOf[Long] & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    java.lang.Long.valueOf(d)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("hrx")
      val ry = ctx.freshName("hry")
      val t = ctx.freshName("ht")
      s"""
         |long $x = $a & ${mask}L;
         |long $y = $b & ${mask}L;
         |long $d = 0L;
         |for (long $s = ${1L << (bits - 1)}L; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_hilbert"
}

object HilbertIndex {
  def apply(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(
      HilbertIndex(ColumnBridge.expression(x), ColumnBridge.expression(y), bits))
}
