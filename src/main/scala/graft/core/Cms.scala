package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, PlanExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.CountMinSketchAgg
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min-sketch frequency estimation — the heavy-hitters path when
  * the key domain is too large to groupBy exactly (per-URL / per-token
  * counts over a 100 TB crawl): a fixed w·d integer grid per executor,
  * summed cell-wise map-side, instead of a shuffle keyed on billions
  * of distinct keys. Guarantees: never an underestimate; overestimate
  * ≤ eps·N with probability ≥ confidence.
  *
  * Wraps Spark's own CountMinSketchAgg (the TypedImperative aggregate
  * behind SQL `count_min_sketch`) and pairs it with a probe expression
  * shaped exactly like the [[Bloom]] pair: the sketch side arrives as
  * a scalar subquery, executed once and shipped to every probe task,
  * deserialized once per expression instance — never per row.
  */
object Cms {

  /** Aggregate a column into a serialized count-min sketch (BinaryType,
    * one row). Integral children are counted via their Long value,
    * strings via their UTF-8 bytes (Spark's own agg dispatch —
    * [[estimate]] probes with the same encoding). */
  def agg(c: Column, eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): Column =
    Bridge.column(new CountMinSketchAgg(Bridge.expression(c),
      Literal(eps), Literal(confidence), Literal(seed)).toAggregateExpression())

  /** Estimated frequency of `c` against a one-row/one-column sketch
    * frame built with [[agg]] — planned as a scalar subquery, like
    * [[Bloom.mightContain]]. */
  def estimate(sketch: DataFrame, c: Column): Column =
    Bridge.column(CmsEstimate(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        sketch.queryExecution.analyzed),
      Bridge.expression(c)))
}

/** Probe a serialized count-min sketch for an item's estimated count.
  * `sketchExpr` must be foldable or a (scalar) subquery — evaluated
  * once, the deserialized grid cached on the expression instance for
  * the task's lifetime (the BloomFilterMightContain lifecycle). */
case class CmsEstimate(sketchExpr: Expression, itemExpr: Expression)
    extends BinaryExpression {
  override def left: Expression = sketchExpr
  override def right: Expression = itemExpr
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (sketchExpr.dataType, itemExpr.dataType) match {
      case (BinaryType, _)
          if !(sketchExpr.foldable ||
            sketchExpr.exists(_.isInstanceOf[PlanExpression[_]])) =>
        TypeCheckResult.TypeCheckFailure(
          "cms_estimate needs a constant or scalar-subquery sketch")
      case (BinaryType, ByteType | ShortType | IntegerType | LongType |
          StringType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate needs (binary sketch, integral or string item), got ($s, $i)")
    }

  @transient private lazy val cms: CountMinSketch =
    sketchExpr.eval() match {
      case b: Array[Byte] => CountMinSketch.readFrom(b)
      case _              => null
    }

  override def eval(input: InternalRow): Any = {
    if (cms == null) return null
    val v = itemExpr.eval(input)
    if (v == null) null
    else itemExpr.dataType match {
      case StringType => CmsEstimate.probeString(cms, v.asInstanceOf[UTF8String])
      case _ => CmsEstimate.probeLong(cms, v.asInstanceOf[Number].longValue())
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ops = CmsEstimate.getClass.getName.stripSuffix("$") + "$.MODULE$"
    // a null sketch means the snippet below is unreachable (the sketch
    // child's isNull short-circuits nullSafeCodeGen), so a bare null
    // reference keeps the generated source compilable
    val ref = if (cms == null) "null"
      else ctx.addReferenceObj("cms", cms, classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, (_, item) => itemExpr.dataType match {
      case StringType => s"${ev.value} = $ops.probeString($ref, $item);"
      case _          => s"${ev.value} = $ops.probeLong($ref, (long) $item);"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(sketchExpr = newLeft, itemExpr = newRight)
}

object CmsEstimate {
  /** The agg counts integrals via addLong — probe the same domain. */
  def probeLong(cms: CountMinSketch, v: Long): Long =
    cms.estimateCount(java.lang.Long.valueOf(v))

  /** The agg counts strings via their UTF-8 bytes (addBinary). */
  def probeString(cms: CountMinSketch, s: UTF8String): Long =
    cms.estimateCount(s.getBytes)
}
