package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE merge replay over one word as a native kernel: split to code
  * points, then one greedy left-to-right scan per learned merge — the
  * encode hot loop of [[graft.operators.Bpe]].
  *
  * Why an expression and not the string-fold: the `aggregate` HOF
  * formulation evaluates interpreted AND rebuilds its space-joined
  * accumulator on every step (O(len²) per word PER MERGE); this kernel
  * is O(len) per merge over a symbol array, with the merge table shipped
  * once per task as a codegen reference object. Code-point splitting
  * matches Spark's `substr` semantics exactly, so the kernel is
  * bitwise-interchangeable with the HOF path (BpeSpec property-tests
  * the equivalence; the HOF form stays as the executable reference). */
case class BpeEncodeWord(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_encode_word requires a string argument, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // lhs/rhs pairs flattened to one String[] — Janino-friendly, one object
  private lazy val flatMerges: Array[String] =
    merges.iterator.flatMap(m => Iterator(m._1, m._2)).toArray

  override def nullSafeEval(w: Any): Any =
    BpeEncodeWord.encodeWord(w.asInstanceOf[UTF8String], flatMerges)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", flatMerges, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeEncodeWord.encodeWord($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeWord =
    copy(child = newChild)
}

object BpeEncodeWord {

  /** Static helper the generated code calls. `flat` holds (lhs, rhs)
    * pairs at (2i, 2i+1). */
  def encodeWord(w: UTF8String, flat: Array[String]): ArrayData = {
    val s = w.toString
    // split to code points (Spark substr / DuckDB string-index semantics)
    var syms = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(s.substring(i, i + n))
      i += n
    }
    var m = 0
    while (m < flat.length) {
      val l = flat(m); val r = flat(m + 1)
      val out = new java.util.ArrayList[String](syms.size)
      var j = 0
      while (j < syms.size) {
        val x = syms.get(j)
        if (!out.isEmpty && out.get(out.size - 1) == l && x == r) {
          out.set(out.size - 1, l + r) // greedy left-to-right merge
        } else out.add(x)
        j += 1
      }
      syms = out
      m += 2
    }
    val arr = new Array[Any](syms.size)
    var k = 0
    while (k < syms.size) { arr(k) = UTF8String.fromString(syms.get(k)); k += 1 }
    new GenericArrayData(arr)
  }

  def apply(c: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncodeWord(ColumnBridge.expression(c), merges))
}
