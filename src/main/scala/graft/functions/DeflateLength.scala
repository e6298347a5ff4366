package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate-compressed byte length of a string — the compression-ratio
  * quality signal (a high ratio ⇒ templated/repetitive text; a ratio
  * near 1 on long text ⇒ noise/binary junk) used by RedPajama/CCNet-
  * style corpus filters alongside the Gopher rules. Native codegen'd
  * expression (house rule: zero UDFs); the generated code is one
  * static call compressing the row's UTF-8 bytes with
  * `java.util.zip.Deflater` at BEST_SPEED, no dictionary, so the
  * length is a pure function of the bytes — deterministic across
  * partitions, hosts and JVM versions that bundle the same zlib level
  * tables (spec-pinned laws, not exact bytes, are the contract:
  * repetitive < shuffled, monotone-ish under concatenation, empty = a
  * constant header).
  *
  * Per-row cost is O(len) with a thread-local Deflater reused across
  * rows — no allocation churn inside whole-stage codegen's tight loop.
  * Emitting the LENGTH (not the ratio) keeps the column integral; the
  * caller derives ratio_scaled = len·10⁶ div orig_len in exact
  * integer arithmetic. */
case class DeflateLength(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_len requires a string argument, got $t")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any): Any =
    DeflateLength.deflatedLength(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DeflateLength.deflatedLength($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLength =
    copy(child = newChild)
}

object DeflateLength {

  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED, true)
  }
  private val sink = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](64 * 1024)
  }

  /** Static helper the generated code calls. */
  def deflatedLength(u: UTF8String): Long = {
    val bytes = u.getBytes
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var total = 0L
    val buf = sink.get()
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  def apply(c: Column): Column =
    ColumnBridge.column(DeflateLength(ColumnBridge.expression(c)))
}
