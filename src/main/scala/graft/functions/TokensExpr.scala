package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused whitespace tokenization — lowercase → split on whitespace
  * runs ([[TextFunctions.Ws]]) → drop empties in ONE codegen'd static
  * call. Semantically identical to the
  * column-algebra chain `filter(split(lower(text), Ws), len > 0)`
  * (pinned bit-equal in TextFunctionsSpec), but that chain's `filter`
  * is a HigherOrderFunction with CodegenFallback — interpreted
  * per-row — and it sits on the hot path of every token-explode
  * operator (t10/t11/t13/t18/t19/t21/t24). Same lowercase as Spark's
  * `lower` (UTF8String.toLowerCase) and same regex split as Spark's
  * `split` (java.util.regex on the string form), so unicode behavior
  * matches the HOF chain exactly.
  */
object TokensOps {
  private val ws = java.util.regex.Pattern.compile(TextFunctions.Ws)

  def tokens(s: UTF8String): ArrayData = {
    val parts = ws.split(s.toLowerCase.toString)
    val out = new java.util.ArrayList[AnyRef](parts.length)
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) out.add(UTF8String.fromString(parts(i)))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class TokensExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tokens needs string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    TokensOps.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TokensOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.tokens($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokensExpr =
    copy(child = newChild)
}

object TokensExprs {
  import org.apache.spark.sql.graftbridge.Bridge
  def tokens_native(c: Column): Column =
    Bridge.column(TokensExpr(Bridge.expression(c)))
}
