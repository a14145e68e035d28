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
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
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
}

case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"cosine needs two array<float>, got $other")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = VectorOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double cosr = $cls.cosine($a, $b);
         |if (cosr == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = cosr.doubleValue(); }
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
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

/** Column builders. */
object VectorExprs {
  import org.apache.spark.sql.graftbridge.Bridge

  def cosine_native(a: Column, b: Column): Column =
    Bridge.column(CosineSimExpr(Bridge.expression(a), Bridge.expression(b)))
  def lsh_bucket(v: Column, planes: Int, offset: Int): Column =
    Bridge.column(LshBucketExpr(Bridge.expression(v), planes, offset))
}
