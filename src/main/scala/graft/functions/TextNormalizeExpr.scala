package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization — the first narrow pass of every text
  * pipeline: lowercase → accent strip (NFD, drop combining marks) →
  * NFC recompose → whitespace-run collapse → trim. One codegen'd
  * static call per row (Spark ships no unicode-normalize function).
  * The DuckDB oracle mirror is
  * `trim(regexp_replace(nfc_normalize(strip_accents(lower(x))), Ws, ' ', 'g'))`
  * with the shared explicit whitespace class [[TextFunctions.Ws]]
  * — utf8proc's strip_accents and the NFD/\p{M} form agree on Latin
  * accented letters (the t17 gate covers composed examples).
  */
object TextNormalizeOps {
  def normalize(s: UTF8String): UTF8String = {
    val lower = s.toString.toLowerCase(java.util.Locale.ROOT)
    val stripped = Normalizer.normalize(lower, Normalizer.Form.NFD)
      .replaceAll("\\p{M}", "")
    val nfc = Normalizer.normalize(stripped, Normalizer.Form.NFC)
    UTF8String.fromString(nfc.replaceAll(TextFunctions.Ws, " ").trim)
  }
}

case class TextNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"normalize_text needs string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextNormalizeOps.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TextNormalizeOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.normalize($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextNormalizeExpr =
    copy(child = newChild)
}

object TextNormalizeExprs {
  import org.apache.spark.sql.graftbridge.Bridge
  def normalize_text(c: Column): Column =
    Bridge.column(TextNormalizeExpr(Bridge.expression(c)))
}
