package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE corpus encoder: lowercased whitespace tokens of a text column,
  * each segmented by a learned merge list (graft.operators.Bpe.train),
  * emitted as one flat array of subword symbols. Rank-priority
  * merging — repeatedly merge the present pair with the lowest merge
  * rank — the standard encoder equivalence of replaying merges in
  * learned order (pinned against the order-replay reference in
  * BpeSpec). One static call per row, codegen'd; the merge table is
  * a shared per-executor hash map, O(merges) built once. */
object BpeEncodeOps {

  final class Table(val ranks: java.util.HashMap[String, Integer])
      extends Serializable

  def buildTable(pairs: Seq[(String, String)]): Table = {
    val m = new java.util.HashMap[String, Integer](pairs.size * 2)
    pairs.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + " " + b, Integer.valueOf(i))
    }
    new Table(m)
  }

  private def encodeWord(w: String, t: Table,
      out: java.util.ArrayList[UTF8String]): Unit = {
    val syms = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) { syms.add(String.valueOf(w.charAt(i))); i += 1 }
    var done = syms.size < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = t.ranks.get(syms.get(j) + " " + syms.get(j + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestAt = j
        }
        j += 1
      }
      if (bestAt < 0) done = true
      else {
        // merge ALL occurrences of the winning pair left-to-right in
        // one pass — the training rewrite's greedy non-overlap order
        // (a just-merged symbol can never re-form the same pair, so
        // not advancing k after a merge cannot loop)
        var k = 0
        while (k < syms.size - 1) {
          val r = t.ranks.get(syms.get(k) + " " + syms.get(k + 1))
          if (r != null && r.intValue() == bestRank) {
            syms.set(k, syms.get(k) + syms.get(k + 1))
            syms.remove(k + 1)
          } else k += 1
        }
        if (syms.size < 2) done = true
      }
    }
    var j = 0
    while (j < syms.size) { out.add(UTF8String.fromString(syms.get(j))); j += 1 }
  }

  def encode(text: UTF8String, t: Table): ArrayData = {
    val words = text.toString.toLowerCase(java.util.Locale.ROOT)
      .split(TextFunctions.Ws).filter(_.nonEmpty)
    val out = new java.util.ArrayList[UTF8String]()
    words.foreach(encodeWord(_, t, out))
    new GenericArrayData(out.toArray)
  }
}

case class BpeEncodeExpr(child: Expression, pairs: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"bpe_encode needs string, got $other")
  }

  @transient private lazy val table = BpeEncodeOps.buildTable(pairs)

  override def nullSafeEval(input: Any): Any =
    BpeEncodeOps.encode(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = BpeEncodeOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val tRef = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeEncodeOps.Table].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.encode($c, $tRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}

object BpeExprs {
  import org.apache.spark.sql.graftbridge.Bridge
  def bpe_encode(text: Column, pairs: Seq[(String, String)]): Column =
    Bridge.column(BpeEncodeExpr(Bridge.expression(text), pairs))
}
