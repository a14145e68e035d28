package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused code-structure signals: ONE code-point pass yielding the t35
  * metrics — non-blank line count, longest line, total chars, ASCII
  * alphanumeric chars. The composable HOF form (split + two
  * transforms + regexp_replace in TextQueries.codeSignalsHof)
  * traverses the text four times, two of them through the regex
  * engine; this pass touches each code point once. Semantics pinned
  * equal to the HOF form in TextFunctionsSpec:
  *  - lines split on '\n' exactly (a trailing '\n' yields a final
  *    empty line, as both engines' split does);
  *  - a line is non-blank when it has any non-SPACE char (mirroring
  *    len(trim(l)) > 0 — trim strips spaces only on both engines);
  *  - lengths are code points (= Spark length()).
  */
object CodeSignalsOps {
  val schema: StructType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("max_line_len", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("n_alnum", LongType, nullable = false)))

  def signals(s: UTF8String): InternalRow = {
    val str = s.toString
    var nLines = 0L; var maxLine = 0L; var nChars = 0L; var nAlnum = 0L
    var lineLen = 0L; var nonBlank = false
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      nChars += 1
      if (cp == '\n') {
        if (nonBlank) nLines += 1
        if (lineLen > maxLine) maxLine = lineLen
        lineLen = 0L; nonBlank = false
      } else {
        lineLen += 1
        if (cp != ' ') nonBlank = true
        if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
            (cp >= '0' && cp <= '9')) nAlnum += 1
      }
      i += Character.charCount(cp)
    }
    if (nonBlank) nLines += 1
    if (lineLen > maxLine) maxLine = lineLen
    new GenericInternalRow(Array[Any](nLines, maxLine, nChars, nAlnum))
  }
}

case class CodeSignalsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = CodeSignalsOps.schema
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"code_signals needs a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    CodeSignalsOps.signals(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CodeSignalsOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.signals($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CodeSignalsExpr =
    copy(child = newChild)
}

object CodeSignalsExprs {
  import org.apache.spark.sql.graftbridge.Bridge
  def code_signals(c: Column): Column =
    Bridge.column(CodeSignalsExpr(Bridge.expression(c)))
}
