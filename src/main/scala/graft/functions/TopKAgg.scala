package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded per-group top-k state: three parallel arrays forming a
  * binary heap with the WORST entry at the root (so a better arrival
  * evicts in O(log k)). `payload` rides along uncompared, stored as
  * raw long bits (exact for the integral and double payloads the
  * serving paths carry). */
final class TopKBuf(val k: Int) {
  val metric = new Array[Double](k)
  val id = new Array[Long](k)
  val payload = new Array[Long](k)
  var n = 0
}

/** Per-group top-k by (metric, id) WITHOUT a sort: the rank-window
  * shape (`row_number over (order by sim desc, id asc) <= k`) plans a
  * full local sort of every candidate row below WindowGroupLimit —
  * measured 42-45 GB of sort spill for a 100k-query serving batch
  * over a 2M-vector index (SCALE_r14_cap), because each query ranks
  * its whole probed cell. This aggregate keeps a k-entry binary heap
  * per group instead: map-side partial aggregation folds candidates
  * into per-query heaps BEFORE the exchange (k·16 bytes of state per
  * group), the shuffle carries q·k rows' worth of heap instead of
  * every candidate, and nothing is ever sorted but the final k
  * entries. Order contract is BIT-IDENTICAL to the window shape:
  * best = (metric asc|desc, id asc), NaN ordered like Spark's double
  * ordering (greatest). Null (id, metric, payload) inputs are REFUSED
  * loudly at update time: the window gave nulls an explicit order and
  * the output struct is non-nullable, so silently skipping (or
  * encoding a null payload as 0 bits) would diverge only on inputs
  * the serving paths never produce — a caller with genuinely nullable
  * inputs must filter or coalesce them first.
  *
  * `payload` is an uncompared column carried per winner (the serving
  * paths carry `sim` on the re-rank and `cell` on the ADC shortlist),
  * so the consumer needs no join back to recover it. Output is
  * `array<struct<id, payload>>` in rank order — `posexplode` yields
  * (rank-1, winner). */
case class TopKByAgg(idExpr: Expression, metricExpr: Expression,
    payloadExpr: Expression, k: Int, asc: Boolean,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf]
  with TernaryLike[Expression] {

  override def first: Expression = idExpr
  override def second: Expression = metricExpr
  override def third: Expression = payloadExpr

  private def integral(dt: DataType): Boolean =
    dt == LongType || dt == IntegerType || dt == ShortType || dt == ByteType

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!integral(idExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by: id must be integral, got ${idExpr.dataType}")
    else if (metricExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by: metric must be double, got ${metricExpr.dataType}")
    else if (!integral(payloadExpr.dataType) &&
        payloadExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by: payload must be integral or double, got ${payloadExpr.dataType}")
    else if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"top_k_by: k must be positive, got $k")
    else TypeCheckResult.TypeCheckSuccess
  }

  // lazy: children may be unresolved while the analyzer transforms the
  // tree (copy/withNewChildren run before resolution)
  private lazy val payloadIsDouble = payloadExpr.dataType == DoubleType

  /** true iff (m1, id1) is WORSE than (m2, id2) — the heap root is the
    * worst kept entry. Double.compare gives Spark's total order
    * (-0.0 < 0.0, NaN greatest). */
  private def worse(m1: Double, id1: Long, m2: Double, id2: Long): Boolean = {
    val c = java.lang.Double.compare(m1, m2)
    if (c != 0) { if (asc) c > 0 else c < 0 }
    else id1 > id2
  }

  private def siftDown(b: TopKBuf, start: Int): Unit = {
    var i = start
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var w = i
      if (l < b.n && worse(b.metric(l), b.id(l), b.metric(w), b.id(w))) w = l
      if (r < b.n && worse(b.metric(r), b.id(r), b.metric(w), b.id(w))) w = r
      if (w == i) return
      val tm = b.metric(i); b.metric(i) = b.metric(w); b.metric(w) = tm
      val ti = b.id(i); b.id(i) = b.id(w); b.id(w) = ti
      val tp = b.payload(i); b.payload(i) = b.payload(w); b.payload(w) = tp
      i = w
    }
  }

  private def push(b: TopKBuf, m: Double, id: Long, p: Long): Unit = {
    if (b.n < k) {
      // insert + sift up
      var i = b.n
      b.metric(i) = m; b.id(i) = id; b.payload(i) = p
      b.n += 1
      while (i > 0) {
        val parent = (i - 1) / 2
        if (worse(b.metric(i), b.id(i), b.metric(parent), b.id(parent))) {
          val tm = b.metric(i); b.metric(i) = b.metric(parent); b.metric(parent) = tm
          val ti = b.id(i); b.id(i) = b.id(parent); b.id(parent) = ti
          val tp = b.payload(i); b.payload(i) = b.payload(parent); b.payload(parent) = tp
          i = parent
        } else return
      }
    } else if (worse(b.metric(0), b.id(0), m, id)) {
      // strictly better than the worst kept -> replace the root
      b.metric(0) = m; b.id(0) = id; b.payload(0) = p
      siftDown(b, 0)
    }
  }

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  private def idAsLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override def update(b: TopKBuf, row: InternalRow): TopKBuf = {
    val m = metricExpr.eval(row)
    val id = idExpr.eval(row)
    val p = payloadExpr.eval(row)
    // null inputs fail LOUDLY: the rank window this aggregate replaced
    // gave null metrics an explicit order (nulls-last under desc), and
    // the non-nullable output struct cannot carry a null payload — a
    // silent skip (or payload-as-0-bits) would change results only on
    // inputs the serving paths never produce, exactly the kind of
    // divergence that must surface, not drift
    if (m == null || id == null || p == null)
      throw new IllegalArgumentException(
        s"top_k_by: null ${if (id == null) "id" else if (m == null) "metric"
          else "payload"} input — top-k heap ranking requires non-null " +
          "(id, metric, payload); filter nulls or coalesce them first " +
          "(a rank window orders nulls; this bounded heap refuses them)")
    val pBits =
      if (payloadIsDouble)
        java.lang.Double.doubleToLongBits(p.asInstanceOf[Double])
      else idAsLong(p)
    // Spark's sort keys pass through NormalizeFloatingNumbers:
    // -0.0 orders EQUAL to 0.0 (Double.compare alone would not) —
    // normalize the compared metric the same way (the payload keeps
    // its raw bits)
    val m0 = m.asInstanceOf[Double]
    push(b, if (m0 == 0.0d) 0.0d else m0, idAsLong(id), pBits)
    b
  }

  override def merge(b: TopKBuf, o: TopKBuf): TopKBuf = {
    var i = 0
    while (i < o.n) { push(b, o.metric(i), o.id(i), o.payload(i)); i += 1 }
    b
  }

  override def eval(b: TopKBuf): Any = {
    val order = (0 until b.n).sortWith { (i, j) =>
      // best first = the inverse of `worse`, ties impossible (ids
      // unique per group under the serving contract; id asc otherwise)
      worse(b.metric(j), b.id(j), b.metric(i), b.id(i))
    }
    val idDt = idExpr.dataType
    val pDt = payloadExpr.dataType
    def idOut(v: Long): Any = idDt match {
      case LongType => v
      case IntegerType => v.toInt
      case ShortType => v.toShort
      case ByteType => v.toByte
    }
    new GenericArrayData(order.map { i =>
      val p: Any =
        if (payloadIsDouble) java.lang.Double.longBitsToDouble(b.payload(i))
        else pDt match {
          case LongType => b.payload(i)
          case IntegerType => b.payload(i).toInt
          case ShortType => b.payload(i).toShort
          case ByteType => b.payload(i).toByte
        }
      new GenericInternalRow(Array[Any](idOut(b.id(i)), p))
    }.toArray)
  }

  override def serialize(b: TopKBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + b.n * 24)
    bb.putInt(b.n)
    var i = 0
    while (i < b.n) {
      bb.putDouble(b.metric(i)); bb.putLong(b.id(i)); bb.putLong(b.payload(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val b = new TopKBuf(k)
    var i = 0
    while (i < n) {
      b.metric(i) = bb.getDouble(); b.id(i) = bb.getLong()
      b.payload(i) = bb.getLong()
      i += 1
    }
    b.n = n
    b
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", idExpr.dataType, nullable = false),
    StructField("payload", payloadExpr.dataType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): TopKByAgg =
    copy(idExpr = newFirst, metricExpr = newSecond, payloadExpr = newThird)
  override def prettyName: String = "top_k_by"
}

object TopKExprs {
  /** Per-group top-k winners by (metric asc|desc, id asc), payload
    * riding along — see [[TopKByAgg]]. */
  def top_k_by(id: Column, metric: Column, payload: Column, k: Int,
      asc: Boolean): Column =
    Bridge.column(TopKByAgg(Bridge.expression(id),
      Bridge.expression(metric), Bridge.expression(payload), k, asc)
      .toAggregateExpression())
}
