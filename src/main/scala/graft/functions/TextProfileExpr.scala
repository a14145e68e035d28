package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused token profile: ONE tokenization pass yielding every per-token
  * statistic the text-analysis family needs — token count, summed
  * token length, BPE-ish subword count (ceil(len/4) per token), and
  * per-language stopword hit counts. The composable HOF forms
  * (TextFunctions tokens/meanTokenLenT/subwordCountT/stopwordRatio)
  * are interpreted and re-traverse the token array per metric — and
  * language ID alone needs 5 stopword passes. Same tokenization as
  * TextHashOps.tokenHashes (lowercase Locale.ROOT, ASCII-\s runs),
  * token length in code points (= Spark's length()).
  *
  * Output: struct(n_tok, sum_tok_len, n_subword, sw_hits) with
  * sw_hits ordered by TextProfileOps.langs (sorted language codes).
  */
object TextProfileOps {
  val langs: Seq[String] = TextFunctions.stopwords.keys.toSeq.sorted
  private val stopSets: Array[Set[String]] =
    langs.map(l => TextFunctions.stopwords(l).toSet).toArray

  val schema: StructType = StructType(Seq(
    StructField("n_tok", LongType, nullable = false),
    StructField("sum_tok_len", LongType, nullable = false),
    StructField("n_subword", LongType, nullable = false),
    StructField("sw_hits", ArrayType(LongType, containsNull = false), nullable = false)))

  def profile(s: UTF8String): InternalRow = {
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    val nLangs = stopSets.length
    var nTok = 0L; var sumLen = 0L; var nSub = 0L
    val hits = new Array[Long](nLangs)
    val len = str.length
    var i = 0
    var tokStart = -1
    var tokCps = 0L // code points in the current token
    def endToken(endIdx: Int): Unit = if (tokStart >= 0) {
      nTok += 1
      sumLen += tokCps
      nSub += (tokCps + 3L) / 4L // ceil(len/4)
      val tok = str.substring(tokStart, endIdx)
      var j = 0
      while (j < nLangs) { if (stopSets(j).contains(tok)) hits(j) += 1; j += 1 }
      tokStart = -1; tokCps = 0L
    }
    while (i < len) {
      val cp = str.codePointAt(i)
      val ws = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      if (ws) endToken(i)
      else {
        if (tokStart < 0) tokStart = i
        tokCps += 1
      }
      i += Character.charCount(cp)
    }
    endToken(len)
    new GenericInternalRow(Array[Any](nTok, sumLen, nSub, new GenericArrayData(hits)))
  }
}

case class TextProfileExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TextProfileOps.schema
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"text_profile needs a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    TextProfileOps.profile(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TextProfileOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.profile($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextProfileExpr =
    copy(child = newChild)
}

object TextProfileExprs {
  import org.apache.spark.sql.graftbridge.Bridge
  def text_profile(c: Column): Column =
    Bridge.column(TextProfileExpr(Bridge.expression(c)))
}
