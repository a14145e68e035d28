package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio — a classic cheap quality/repetition
  * signal (boilerplate and template spam compress far below natural
  * prose; high-entropy garbage compresses above it). One codegen'd
  * static call per row; one native zlib stream is REUSED per executor
  * thread, reset() before every call to the same FIXED level and
  * strategy, so the ratio is a pure function of the bytes —
  * deterministic across executors and runs on one JVM version. No
  * DuckDB analog exists, so the gate is CompressRatioSpec (ordering,
  * bounds, determinism) rather than an oracle hash.
  */
object CompressRatioOps {
  // per-row hot path: reuse one native zlib stream + buffer per
  // executor thread (reset() restores the identical fixed
  // level/strategy state, so output — and the ratio — is unchanged).
  // Trade-off: the Deflater is never end()ed, pinning one native zlib
  // stream (~256 KB) per thread for its lifetime — the right call for
  // long-lived executor task pools this expression targets; under
  // heavy thread churn (many short-lived local sessions) that native
  // memory is only reclaimed by the finalizer/cleaner on GC.
  private val deflater = ThreadLocal.withInitial[Deflater](() =>
    new Deflater(Deflater.DEFAULT_COMPRESSION, /*nowrap=*/ true))
  private val buffer = ThreadLocal.withInitial[Array[Byte]](() =>
    new Array[Byte](8192))

  /** compressed_len / raw_len of the UTF-8 bytes; 1.0 for empty. */
  def ratio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) return 1.0
    val d = deflater.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val buf = buffer.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / raw.length.toDouble
  }
}

case class CompressRatioExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"compress_ratio needs string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    CompressRatioOps.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CompressRatioOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.ratio($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CompressRatioExpr =
    copy(child = newChild)
}

object CompressRatioExprs {
  import org.apache.spark.sql.graftbridge.Bridge
  def compress_ratio(c: Column): Column =
    Bridge.column(CompressRatioExpr(Bridge.expression(c)))
}
