package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingle STRINGS as one native pass over the UTF-8 buffer —
  * the string-building twin of [[WinnowFingerprint]]'s hashing kernel.
  *
  * Key invariant making this a byte-range extraction instead of string
  * assembly: splitting on single spaces and re-joining any RUN of
  * consecutive tokens with single spaces reproduces, byte for byte, the
  * span of the original text from the run's first token to its last —
  * the separators between them are exactly one space each by
  * construction (runs of spaces become empty tokens, preserving the
  * count). So shingle i is `text[start(i) .. end(i+n-1))`, zero
  * assembly. A 0x20 byte can never occur inside a multi-byte UTF-8
  * character (continuation bytes are ≥ 0x80), so the boundary scan is a
  * plain byte loop. The higher-order-function formulation this replaces
  * (`transform` + `concat_ws` over `element_at`s, interpreted per
  * element) is kept as [[graft.operators.TextOps.shinglesHof]] — the
  * executable reference TextOpsSpec property-tests against. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"graft_shingles requires n >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires a string argument, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    WordShingles.shingles(s.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  /** Static helper the generated code calls. One pass to find token
    * starts, one slice per shingle — no per-token string objects. */
  def shingles(u: UTF8String, n: Int): ArrayData = {
    val bytes = u.getBytes
    var nTokens = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') nTokens += 1
      i += 1
    }
    val count = nTokens - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Any])
    // starts(t) = byte offset of token t; ends(t) = one past its last byte
    val starts = new Array[Int](nTokens)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val out = new Array[Any](count)
    var s = 0
    while (s < count) {
      val from = starts(s)
      val until =
        if (s + n < nTokens) starts(s + n) - 1 // strip the trailing space
        else bytes.length
      out(s) = UTF8String.fromBytes(bytes, from, until - from)
      s += 1
    }
    new GenericArrayData(out)
  }

  def apply(c: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(c), n))
}
