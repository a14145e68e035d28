package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Mutable per-bucket state: exact population count, exact min id, and
  * the first `cap` member ids seen. Bounded by construction — the
  * whole point: `collect_list` on a degenerate bucket (100M identical
  * signatures) is an executor OOM, this caps at `cap` longs. */
final class BoundedBucketBuf(var n: Long, var rep: Long,
    val members: ArrayBuffer[Long])

/** One-pass bucket profile for hot-bucket guarding: per group returns
  * struct(n, rep, members) where `n`/`rep` are EXACT and `members`
  * holds at most `cap` ids — complete whenever n ≤ cap. Lets LSH
  * candidate generation emit benign buckets' all-pairs straight from
  * the aggregation (no self-join, no second pass over the band set)
  * while hot buckets are detected exactly in the same pass.
  * (The reference has no analog — its single-threaded interpreter
  * never self-joins; this is the Spark-scale path for SURVEY §2's
  * dedup/ANN operator family.) */
case class BoundedBucketAgg(child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedBucketBuf]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bounded_bucket needs a bigint id, got ${child.dataType}")

  override def createAggregationBuffer(): BoundedBucketBuf =
    new BoundedBucketBuf(0L, Long.MaxValue, ArrayBuffer.empty)

  override def update(b: BoundedBucketBuf, row: InternalRow): BoundedBucketBuf = {
    val v = child.eval(row)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      b.n += 1
      if (x < b.rep) b.rep = x
      if (b.members.length < cap) b.members += x
    }
    b
  }

  override def merge(b: BoundedBucketBuf, o: BoundedBucketBuf): BoundedBucketBuf = {
    b.n += o.n
    if (o.rep < b.rep) b.rep = o.rep
    var i = 0
    while (b.members.length < cap && i < o.members.length) {
      b.members += o.members(i); i += 1
    }
    b
  }

  override def eval(b: BoundedBucketBuf): Any =
    InternalRow(b.n, b.rep, new GenericArrayData(b.members.toArray))

  override def serialize(b: BoundedBucketBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(20 + 8 * b.members.length)
    bb.putLong(b.n); bb.putLong(b.rep); bb.putInt(b.members.length)
    b.members.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedBucketBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong; val rep = bb.getLong; val len = bb.getInt
    val ms = new ArrayBuffer[Long](len)
    var i = 0
    while (i < len) { ms += bb.getLong; i += 1 }
    new BoundedBucketBuf(n, rep, ms)
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("rep", LongType, nullable = false),
    StructField("members", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedBucketAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedBucketAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedBucketAgg =
    copy(child = newChild)
  override def prettyName: String = "bounded_bucket"
}

object BucketAggExprs {
  /** struct(n, rep, members≤cap) per group — see [[BoundedBucketAgg]]. */
  def bounded_bucket(id: Column, cap: Int): Column =
    Bridge.column(BoundedBucketAgg(Bridge.expression(id), cap).toAggregateExpression())
}
