package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Mutable per-group state: exact per-dimension DECIMAL(…,6) sums and
  * the group count. `sums` is null until the first vector fixes the
  * dimensionality. */
final class VecMeanBuf(var sums: Array[JBigDecimal], var n: Long)

/** Per-group MEAN VECTOR with graft's Det determinism contract,
  * without the posexplode blow-up: each float component is rounded to
  * DECIMAL scale 6 (HALF_UP — exactly Spark's float→DECIMAL(38,6)
  * cast), summed exactly per dimension, and the final component is
  * decimal-sum.toDouble / count.toDouble — BIT-IDENTICAL to the
  * `posexplode → groupBy(cell, pos) → Det.davg(x)` shape every k-means
  * oracle mirrors (VectorAggSpec pins the equality), while the corpus
  * pass stays one row per vector instead of `dim` rows per vector:
  * the round-11 probe's 2M×64-float refresh scan generated 128M
  * exploded rows before this. Null ELEMENTS fail loudly (a dense-
  * embedding contract — the posexplode shape has per-dim counts this
  * single-count buffer can't mirror); null ARRAYS are skipped like
  * any aggregate input. */
case class VecMeanAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecMeanBuf]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_mean needs array<float>, got $other")
  }

  override def createAggregationBuffer(): VecMeanBuf = new VecMeanBuf(null, 0L)

  override def update(b: VecMeanBuf, row: InternalRow): VecMeanBuf = {
    val v = child.eval(row)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      if (b.sums == null) {
        b.sums = Array.fill(d)(JBigDecimal.ZERO)
      }
      require(b.sums.length == d,
        s"vec_mean: ragged vectors (${b.sums.length} vs $d dims)")
      var i = 0
      while (i < d) {
        // fail LOUDLY on a null element: silently summing it as 0 and
        // counting the vector would diverge from the posexplode +
        // Det.davg shape (which has per-dim counts) — a null cell is a
        // broken embedding, same contract as the ragged require above
        require(!arr.isNullAt(i),
          s"vec_mean: null element at dim $i (embeddings must be dense)")
        // float → double → BigDecimal(valueOf) → scale 6 HALF_UP is
        // exactly Spark's Cast(float, DecimalType(38,6)) semantics
        val x = JBigDecimal.valueOf(arr.getFloat(i).toDouble)
          .setScale(6, RoundingMode.HALF_UP)
        b.sums(i) = b.sums(i).add(x)
        i += 1
      }
      b.n += 1L
    }
    b
  }

  override def merge(b: VecMeanBuf, o: VecMeanBuf): VecMeanBuf = {
    if (o.sums != null) {
      if (b.sums == null) { b.sums = o.sums; b.n = o.n }
      else {
        require(b.sums.length == o.sums.length,
          s"vec_mean: ragged vectors (${b.sums.length} vs ${o.sums.length} dims)")
        var i = 0
        while (i < b.sums.length) { b.sums(i) = b.sums(i).add(o.sums(i)); i += 1 }
        b.n += o.n
      }
    }
    b
  }

  override def eval(b: VecMeanBuf): Any =
    if (b.sums == null) null
    else {
      val n = b.n.toDouble
      new GenericArrayData(b.sums.map(_.doubleValue() / n))
    }

  override def serialize(b: VecMeanBuf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(b.n)
    out.writeInt(if (b.sums == null) -1 else b.sums.length)
    if (b.sums != null) b.sums.foreach { s =>
      val bytes = s.unscaledValue().toByteArray
      out.writeInt(bytes.length); out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecMeanBuf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readLong()
    val d = in.readInt()
    val sums = if (d < 0) null else Array.fill(d) {
      val len = in.readInt()
      val bs = new Array[Byte](len); in.readFully(bs)
      new JBigDecimal(new java.math.BigInteger(bs), 6)
    }
    new VecMeanBuf(sums, n)
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def withNewMutableAggBufferOffset(newOffset: Int): VecMeanAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMeanAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecMeanAgg =
    copy(child = newChild)
  override def prettyName: String = "vec_mean"
}

object VecMeanExprs {
  /** Exact-decimal per-dimension mean of an array<float> column — see
    * [[VecMeanAgg]]. */
  def vec_mean(v: Column): Column =
    Bridge.column(VecMeanAgg(Bridge.expression(v)).toAggregateExpression())
}
