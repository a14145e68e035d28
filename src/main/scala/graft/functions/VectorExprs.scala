package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd vector math. The HOF forms in VectorQueries
  * (zip_with/transform/aggregate folds) are interpreted per element;
  * these run the SAME IEEE operations in the SAME order inside one
  * static-call loop — float elements cast to double individually,
  * sequential left-fold accumulation — so results stay bit-identical
  * to both the HOF forms and the DuckDB list_reduce oracles
  * (VectorExprsSpec pins the equivalences). */
object VectorOps {

  /** Cosine similarity of two float vectors: dot / (√na · √nb), all
    * three sums accumulated left-to-right like the staged folds.
    * Ragged pair → null, matching the HOF form (zip_with pads with
    * null, the fold's acc+null nulls the whole dot) and the DuckDB
    * oracle — a truncated embedding must not emit a similarity the
    * oracle drops. */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double =
    cosineMixed(a, b, aDouble = false, bDouble = false)

  /** [[cosine]] over float OR double element arrays on either side —
    * the centroid-probing shape pairs a float corpus vector with the
    * double centroid array the Det-decimal mean produced. Each
    * accumulator is its own ascending sum, so the result is
    * bit-identical to the three separate HOF folds it replaces. */
  def cosineMixed(a: ArrayData, b: ArrayData,
      aDouble: Boolean, bDouble: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Ascending-fold inner product — bit-identical to
    * fold(zip_with(a, b, x·y)); null on length mismatch like
    * [[cosineMixed]]. */
  def dotMixed(a: ArrayData, b: ArrayData,
      aDouble: Boolean, bDouble: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      dot += x * y
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }

  /** Sign-bit LSH bucket under `planes` deterministic hyperplanes
    * starting at global plane index `offset` — same integer plane
    * family as VectorQueries.planeVal. */
  def lshBucket(v: ArrayData, planes: Int, offset: Int): Long = {
    val dim = v.numElements()
    var bucket = 0L
    var j = 0
    while (j < planes) {
      val g = offset + j
      var dot = 0.0
      var i = 0
      while (i < dim) {
        val plane = ((g * 64L + i) * 2654435761L % 1000003L).toDouble / 1000003.0 - 0.5
        dot += v.getFloat(i).toDouble * plane
        i += 1
      }
      if (dot > 0.0) bucket += (1L << j)
      j += 1
    }
    bucket
  }

  /** Signed (±1) random projection to `outDims` dims, scaled by
    * 1/√outDims (Achlioptas 2003's database-friendly JL form — ±1
    * entries preserve pairwise distances in expectation like Gaussian
    * ones). Sign (j,i) comes from the same integer plane family as
    * [[lshBucket]]; each output is a left-fold over the input dims and
    * ONE division, so the HOF mirror and the DuckDB oracle reproduce
    * it bit-identically. */
  def randomProject(v: ArrayData, outDims: Int): ArrayData = {
    val dim = v.numElements()
    val out = new Array[Double](outDims)
    val scale = math.sqrt(outDims.toDouble)
    var j = 0
    while (j < outDims) {
      var s = 0.0
      var i = 0
      while (i < dim) {
        val h = (j * 64L + i) * 2654435761L % 1000003L
        val x = v.getFloat(i).toDouble
        s += (if (h % 2L == 0L) x else -x)
        i += 1
      }
      out(j) = s / scale
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Codebook ops over a literal centroid table (row-major k×d doubles,
  * cell ids alongside — ids can be sparse after Lloyd drops). Distances
  * accumulate the SAME left-fold Σ(x_i − c_i)² per cell, cells scanned
  * in ascending id order with strict `<`, so ties keep the smallest
  * cell id — exactly the HOF when-chain and the oracle's
  * `ORDER BY dist ASC, cell ASC`. `offset` addresses a subspace window
  * of the full vector, so PQ never materializes slice arrays per row. */
object CentroidOps {

  def nearest(v: ArrayData, offset: Int, d: Int,
      cellIds: Array[Long], flat: Array[Double]): Long = {
    val k = cellIds.length
    var best = Double.PositiveInfinity
    var bestCell = cellIds(0)
    var j = 0
    while (j < k) {
      var s = 0.0
      var i = 0
      while (i < d) {
        val x = v.getFloat(offset + i).toDouble - flat(j * d + i)
        s += x * x
        i += 1
      }
      if (s < best) { best = s; bestCell = cellIds(j) }
      j += 1
    }
    bestCell
  }

  /** Top-`n` nearest cells by (dist asc, cell asc) — multi-probe
    * routing. Same fold and tie order as [[nearest]] (scan in
    * ascending cell-id order, strict `<`), so element 0 always equals
    * [[nearest]]'s answer and the list matches the oracle's
    * `row_number() OVER (ORDER BY dist ASC, cell ASC) <= n`. `n` is
    * probe-sized (≤8): a straight insertion pass, no heap. */
  def nearestN(v: ArrayData, offset: Int, d: Int,
      cellIds: Array[Long], flat: Array[Double], n: Int): Array[Long] = {
    val k = cellIds.length
    val m = math.min(n, k)
    val bestD = Array.fill(m)(Double.PositiveInfinity)
    val bestC = new Array[Long](m)
    var j = 0
    while (j < k) {
      var s = 0.0
      var i = 0
      while (i < d) {
        val x = v.getFloat(offset + i).toDouble - flat(j * d + i)
        s += x * x
        i += 1
      }
      if (s < bestD(m - 1)) {
        var p = m - 1
        while (p > 0 && s < bestD(p - 1)) {
          bestD(p) = bestD(p - 1); bestC(p) = bestC(p - 1); p -= 1
        }
        bestD(p) = s; bestC(p) = cellIds(j)
      }
      j += 1
    }
    bestC
  }

  /** Distance from the vector's window to the centroid named by
    * `code`; an unknown code yields Double.MaxValue (unreachable when
    * codes come from [[nearest]] over the same table). */
  def dist(v: ArrayData, code: Long, offset: Int, d: Int,
      cellIds: Array[Long], flat: Array[Double]): Double = {
    val k = cellIds.length
    var j = 0
    while (j < k) {
      if (cellIds(j) == code) {
        var s = 0.0
        var i = 0
        while (i < d) {
          val x = v.getFloat(offset + i).toDouble - flat(j * d + i)
          s += x * x
          i += 1
        }
        return s
      }
      j += 1
    }
    Double.MaxValue
  }
}

case class NearestCentroidExpr(child: Expression, cellIds: Array[Long],
    flat: Array[Double], d: Int, offset: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"nearest_centroid needs array<float>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    CentroidOps.nearest(input.asInstanceOf[ArrayData], offset, d, cellIds, flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CentroidOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val cellsRef = ctx.addReferenceObj("cellIds", cellIds, "long[]")
    val flatRef = ctx.addReferenceObj("flat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls.nearest($c, $offset, $d, $cellsRef, $flatRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidExpr =
    copy(child = newChild)
}

object AdcOps {
  /** Per-query ADC lookup table over every (subspace, code) pair:
    * entry [s·k + j] = Σ_i (q_res[s·dSub+i] − book_s[j][i])², the SAME
    * left fold [[CentroidOps.dist]] computes — building all m·k
    * entries once per query replaces the per-candidate distance
    * recomputation (dSub mults per subspace) with one array lookup.
    * `flat` is the m·k·dSub row-major concat of the codebooks;
    * `codesFlat` the matching m·k cell ids (codes can be sparse after
    * Lloyd drops, so entries are keyed by POSITION and [[adc]] maps a
    * stored code to its position). */
  def lut(qres: ArrayData, m: Int, k: Int, dSub: Int,
      flat: Array[Double]): Array[Double] = {
    val out = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < k) {
        var sum = 0.0
        var i = 0
        while (i < dSub) {
          val x = qres.getFloat(s * dSub + i).toDouble - flat((s * k + j) * dSub + i)
          sum += x * x
          i += 1
        }
        out(s * k + j) = sum
        j += 1
      }
      s += 1
    }
    out
  }

  /** ADC distance of one candidate: Σ_s lut[s·k + pos(code_s)] — m
    * lookups, no multiplies. Code→position mapping scans the ≤k ids
    * per subspace (k = 16). An unknown code contributes MaxValue,
    * unreachable when codes come from the same books. */
  def adc(lut: ArrayData, codes: ArrayData, m: Int, k: Int,
      codeIds: Array[Long]): Double = {
    var sum = 0.0
    var s = 0
    while (s < m) {
      val code = codes.getByte(s).toLong
      var j = 0
      var found = false
      while (j < k && !found) {
        if (codeIds(s * k + j) == code) {
          sum += lut.getDouble(s * k + j)
          found = true
        }
        j += 1
      }
      if (!found) sum += Double.MaxValue
      s += 1
    }
    sum
  }

  /** ADC of one candidate DIRECTLY from the query residual — the
    * [[lut]] entry fold inlined at the candidate's own code position,
    * so per candidate it does exactly the m code→position scans [[adc]]
    * does plus m·dSub multiply-adds, and NOTHING allocates or hashes.
    * Values are BIT-IDENTICAL to lut-then-adc (the same left fold over
    * the same floats produces each addend, summed in the same s
    * order). This is the serving shortlist's hot loop at gather scale
    * (~3·10⁹ candidates at the 100k-query cap): an executor-side LUT
    * memo was measured 2.8× slower there — the per-candidate map
    * lookup's tuple/boxing churn dwarfed the ~56 FMAs it saved — and
    * broadcasting materialized LUTs was ~5× the panel weight. */
  def adcDirect(qres: ArrayData, codes: ArrayData, m: Int, k: Int,
      dSub: Int, flat: Array[Double], positions: Array[Int]): Double = {
    var sum = 0.0
    var s = 0
    while (s < m) {
      val j = positions((s << 8) | (codes.getByte(s) & 0xff))
      if (j < 0) sum += Double.MaxValue
      else {
        var d = 0.0
        val base = (s * k + j) * dSub
        val qbase = s * dSub
        var i = 0
        while (i < dSub) {
          val x = qres.getFloat(qbase + i).toDouble - flat(base + i)
          d += x * x
          i += 1
        }
        sum += d
      }
      s += 1
    }
    sum
  }

  /** Dense code→position table for [[adcDirect]]: entry
    * [s·256 + (byte & 0xff)] = the position j whose book id the [[adc]]
    * scan would match for that stored byte, −1 for unknown codes (same
    * MaxValue contract; positions replay the scan's FIRST-match rule,
    * though book ids are unique per subspace anyway). The scan compares
    * the stored byte SIGNED (-128‥127) against the book id — so an id
    * outside that range matches no byte at all, and a negative id
    * matches the byte whose masked value wraps to it (id & 0xff). The
    * table replicates that exactly; production books (kmeans labels,
    * ≤16 entries, ids 0‥15) never leave the common range, but the
    * bit-parity pin holds for arbitrary callers too
    * (VectorExprsSpec's adversarial-books property). */
  def positionsOf(m: Int, k: Int, codeIds: Array[Long]): Array[Int] = {
    val out = Array.fill(m * 256)(-1)
    var s = 0
    while (s < m) {
      var j = k - 1
      while (j >= 0) { // descending so the FIRST match wins like the scan
        val id = codeIds(s * k + j)
        if (id >= -128L && id < 128L) out((s << 8) | (id.toInt & 0xff)) = j
        j -= 1
      }
      s += 1
    }
    out
  }
}

/** Fused per-candidate ADC straight off the query residual — see
  * [[AdcOps.adcDirect]]. This is the serving shortlist's scoring
  * expression: the panel broadcasts the 256 B float residual (never a
  * materialized LUT — ~5× the weight) and the hot loop neither
  * allocates nor hashes (an executor-side LUT memo was measured 2.8×
  * slower at the 100k-query cap's ~3·10⁹ candidates — its per-row
  * map lookup churned more than the saved multiply-adds). Values are
  * bit-identical to the lut-then-adc composition (same folds, same
  * order), so every oracle replays unchanged. */
case class AdcDirectExpr(left: Expression, right: Expression, m: Int,
    k: Int, dSub: Int, flat: Array[Double], positions: Array[Int])
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"adc_direct needs (array<float>, array<tinyint>), got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    AdcOps.adcDirect(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      m, k, dSub, flat, positions)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = AdcOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val flatRef = ctx.addReferenceObj("flat", flat, "double[]")
    val posRef = ctx.addReferenceObj("positions", positions, "int[]")
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = $cls.adcDirect($l, $r, $m, $k, $dSub, $flatRef, $posRef);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AdcDirectExpr = copy(left = newLeft, right = newRight)
  override def prettyName: String = "adc_direct"
}

/** Per-query ADC lookup table (array<double>, length m·k) from the
  * query residual — see [[AdcOps.lut]]. */
case class PqLutExpr(child: Expression, m: Int, k: Int, dSub: Int,
    flat: Array[Double]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"pq_lut needs array<float>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      AdcOps.lut(input.asInstanceOf[ArrayData], m, k, dSub, flat))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = AdcOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val flatRef = ctx.addReferenceObj("flat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"$cls.lut($c, $m, $k, $dSub, $flatRef));")
  }

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}

/** Candidate ADC off the per-query LUT and the stored codes — m array
  * lookups per candidate, zero multiplies (see [[AdcOps.adc]]). */
case class AdcLutExpr(left: Expression, right: Expression, m: Int, k: Int,
    codeIds: Array[Long]) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"adc_lut needs (array<double>, array<tinyint>), got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    AdcOps.adc(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], m, k, codeIds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = AdcOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val idsRef = ctx.addReferenceObj("codeIds", codeIds, "long[]")
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"${ev.value} = $cls.adc($l, $r, $m, $k, $idsRef);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AdcLutExpr = copy(left = newLeft, right = newRight)
}

/** Multi-probe routing: the `n` nearest cells (dist asc, cell asc) as
  * an array — element 0 ≡ [[NearestCentroidExpr]], so probe 1 and
  * multi-probe route identically on the first cell. */
case class NearestCellsExpr(child: Expression, cellIds: Array[Long],
    flat: Array[Double], d: Int, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"nearest_cells needs array<float>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      CentroidOps.nearestN(input.asInstanceOf[ArrayData], 0, d, cellIds, flat, n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CentroidOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val cellsRef = ctx.addReferenceObj("cellIds", cellIds, "long[]")
    val flatRef = ctx.addReferenceObj("flat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"$cls.nearestN($c, 0, $d, $cellsRef, $flatRef, $n));")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellsExpr =
    copy(child = newChild)
}

case class CentroidDistExpr(left: Expression, right: Expression,
    cellIds: Array[Long], flat: Array[Double], d: Int, offset: Int)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"centroid_dist needs (array<float>, bigint), got $other")
  }

  override def nullSafeEval(v: Any, code: Any): Any =
    CentroidOps.dist(v.asInstanceOf[ArrayData], code.asInstanceOf[Long],
      offset, d, cellIds, flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CentroidOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val cellsRef = ctx.addReferenceObj("cellIds", cellIds, "long[]")
    val flatRef = ctx.addReferenceObj("flat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, (v, code) =>
      s"${ev.value} = $cls.dist($v, $code, $offset, $d, $cellsRef, $flatRef);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CentroidDistExpr =
    copy(left = l, right = r)
}

case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  private def elem(dt: DataType): Option[Boolean] = dt match {
    case ArrayType(FloatType, _) => Some(false)
    case ArrayType(DoubleType, _) => Some(true)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elem(left.dataType).isDefined && elem(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine needs two array<float|double>, got (${left.dataType}, ${right.dataType})")
  private lazy val aDouble: Boolean = elem(left.dataType).get
  private lazy val bDouble: Boolean = elem(right.dataType).get

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosineMixed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      aDouble, bDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = VectorOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double cosr = $cls.cosineMixed($a, $b, $aDouble, $bDouble);
         |if (cosr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = cosr.doubleValue(); }
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
}

case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  private def elem(dt: DataType): Option[Boolean] = dt match {
    case ArrayType(FloatType, _) => Some(false)
    case ArrayType(DoubleType, _) => Some(true)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elem(left.dataType).isDefined && elem(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot needs two array<float|double>, got (${left.dataType}, ${right.dataType})")
  private lazy val aDouble: Boolean = elem(left.dataType).get
  private lazy val bDouble: Boolean = elem(right.dataType).get

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotMixed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      aDouble, bDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = VectorOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double dotr = $cls.dotMixed($a, $b, $aDouble, $bDouble);
         |if (dotr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = dotr.doubleValue(); }
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductExpr =
    copy(left = l, right = r)
}

case class LshBucketExpr(child: Expression, planes: Int, offset: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"lsh_bucket needs array<float>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    VectorOps.lshBucket(input.asInstanceOf[ArrayData], planes, offset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = VectorOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.lshBucket($c, $planes, $offset);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

case class RandomProjectExpr(child: Expression, outDims: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"random_project needs array<float>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    VectorOps.randomProject(input.asInstanceOf[ArrayData], outDims)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = VectorOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.randomProject($c, $outDims);")
  }

  override protected def withNewChildInternal(newChild: Expression): RandomProjectExpr =
    copy(child = newChild)
}

/** Column builders. */
object VectorExprs {
  import org.apache.spark.sql.graftbridge.Bridge

  def cosine_native(a: Column, b: Column): Column =
    Bridge.column(CosineSimExpr(Bridge.expression(a), Bridge.expression(b)))
  def dot_native(a: Column, b: Column): Column =
    Bridge.column(DotProductExpr(Bridge.expression(a), Bridge.expression(b)))
  def lsh_bucket(v: Column, planes: Int, offset: Int): Column =
    Bridge.column(LshBucketExpr(Bridge.expression(v), planes, offset))
  def random_project(v: Column, outDims: Int): Column =
    Bridge.column(RandomProjectExpr(Bridge.expression(v), outDims))

  private def flatten(centers: Seq[(Int, Array[Double])]): (Array[Long], Array[Double]) =
    (centers.map(_._1.toLong).toArray, centers.flatMap(_._2).toArray)

  /** Nearest-centroid cell id over the vector window [offset, offset+d). */
  def nearest_centroid(v: Column, centers: Seq[(Int, Array[Double])],
      d: Int, offset: Int = 0): Column = {
    val (cells, flat) = flatten(centers)
    Bridge.column(NearestCentroidExpr(Bridge.expression(v), cells, flat, d, offset))
  }

  /** The `n` nearest cell ids (dist asc, cell asc) — multi-probe routing. */
  def nearest_cells(v: Column, centers: Seq[(Int, Array[Double])],
      d: Int, n: Int): Column = {
    val (cells, flat) = flatten(centers)
    Bridge.column(NearestCellsExpr(Bridge.expression(v), cells, flat, d, n))
  }

  /** Row-major flattening of per-subspace codebooks, padded to the
    * widest subspace (Lloyd drops can leave ragged books): positions
    * without an entry carry a Long.MinValue code id that no stored
    * byte code can match. */
  private def flattenBooks(books: Seq[Seq[(Int, Array[Double])]])
      : (Int, Int, Array[Double], Array[Long]) = {
    val m = books.size
    val dSub = books.head.head._2.length
    val k = books.map(_.size).max
    val flat = new Array[Double](m * k * dSub)
    val ids = Array.fill(m * k)(Long.MinValue)
    for (s <- 0 until m; (entry, j) <- books(s).zipWithIndex) {
      ids(s * k + j) = entry._1.toLong
      System.arraycopy(entry._2, 0, flat, (s * k + j) * dSub, dSub)
    }
    (k, dSub, flat, ids)
  }

  /** Per-query ADC lookup table (m·k doubles) from a residual column. */
  def pq_lut(qres: Column, books: Seq[Seq[(Int, Array[Double])]]): Column = {
    val (k, dSub, flat, _) = flattenBooks(books)
    Bridge.column(PqLutExpr(Bridge.expression(qres), books.size, k, dSub, flat))
  }

  /** Fused candidate ADC straight off the query residual — the
    * serving shortlist's shape, where the residual rides the
    * broadcast panel (256 B float) instead of the ~1 KB materialized
    * LUT. Bit-identical to lut-then-adc (same folds, same order);
    * see [[AdcDirectExpr]] for why no executor-side LUT memo. */
  def adc_direct(qres: Column, codes: Column,
      books: Seq[Seq[(Int, Array[Double])]]): Column = {
    val (k, dSub, flat, ids) = flattenBooks(books)
    Bridge.column(AdcDirectExpr(Bridge.expression(qres),
      Bridge.expression(codes), books.size, k, dSub, flat,
      AdcOps.positionsOf(books.size, k, ids)))
  }

  /** Candidate ADC: m lookups into the per-query LUT, zero multiplies. */
  def adc_lut(lut: Column, codes: Column,
      books: Seq[Seq[(Int, Array[Double])]]): Column = {
    val (k, _, _, ids) = flattenBooks(books)
    Bridge.column(AdcLutExpr(Bridge.expression(lut), Bridge.expression(codes),
      books.size, k, ids))
  }

  /** Squared distance from the vector window to the centroid `code` names. */
  def centroid_dist(v: Column, code: Column, centers: Seq[(Int, Array[Double])],
      d: Int, offset: Int = 0): Column = {
    val (cells, flat) = flatten(centers)
    Bridge.column(CentroidDistExpr(Bridge.expression(v), Bridge.expression(code),
      cells, flat, d, offset))
  }
}
