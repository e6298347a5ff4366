package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The repo's md5→60-bit gate idiom, as ONE codegen'd expression:
  * `[conv(substring(md5(s), 1, 15), 16, 10), conv(substring(md5(s), 17,
  * 15), 16, 10)]` — both independent 60-bit draws a 128-bit digest
  * carries, computed straight from the digest BYTES.
  *
  * Bitwise identical to the builtin chain (Md5Bits60Spec property-pins
  * it; the DuckDB oracles keep spelling the chain, so every gated query
  * re-proves the equivalence on the real corpus), but skips the chain's
  * three string materializations per draw — the 32-char hex encode, the
  * substring copy, and conv's hex re-parse — plus a fresh
  * `MessageDigest.getInstance` per md5() call (Spark's Md5 delegates to
  * commons-codec, which allocates one per invocation; here a ThreadLocal
  * digest is reset and reused). Motivation (r14 profile): the Poisson
  * bootstrap evaluates B/2 digests per row and spent 154 cpu-s at sf0.1
  * almost entirely in this chain. */
case class Md5Bits60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_md5_bits60 requires a string argument, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    Md5Bits60.bits(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Bits60.bits($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Bits60 =
    copy(child = newChild)

  override def prettyName: String = "graft_md5_bits60"
}

object Md5Bits60 {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static helper the generated code calls. Hex char i (0-based) of the
    * digest is nibble i: chars 1..15 (1-based) = the top 60 bits of
    * bytes 0..7 with the leading nibble dropped; chars 17..31 = the same
    * over bytes 8..15. */
  def bits(u: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val md = digests.get()
    md.reset()
    val d = md.digest(u.getBytes)
    var hi = 0L
    var lo = 0L
    var i = 0
    while (i < 8) { hi = (hi << 8) | (d(i) & 0xffL); i += 1 }
    while (i < 16) { lo = (lo << 8) | (d(i) & 0xffL); i += 1 }
    // chars 1..15 = nibbles 0..14 of the first half (the trailing
    // nibble 15 drops), chars 17..31 = nibbles 16..30 of the second:
    // each draw is the TOP 60 bits of its 64-bit half
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](hi >>> 4, lo >>> 4))
  }

  /** Column form: `element_at(md5Bits60(s), 1)` ≡
    * `conv(substring(md5(s), 1, 15), 16, 10).cast("long")`,
    * `element_at(_, 2)` ≡ the chars-17..31 draw. */
  def apply(c: Column): Column =
    ColumnBridge.column(Md5Bits60(ColumnBridge.expression(c)))
}
