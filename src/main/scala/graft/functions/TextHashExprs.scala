package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd expressions for the text-hash hot path.
  *
  * The composable HOF forms in TextFunctions are correct but
  * INTERPRETED — Spark's higher-order functions run per-element
  * lambdas with no codegen, so tokenHash's per-character fold costs a
  * closure call per char, and the shingle/minhash stages re-traverse
  * arrays per window. These expressions compute the identical
  * arithmetic (same tokenization, same (h·31+cp) mod P fold, same
  * (aᵢ·h+bᵢ) mod P minhash family — TextFunctionsSpec pins native ≡
  * HOF) in tight JVM loops behind a single static call, so
  * whole-stage codegen keeps its span. At 100 TB this is the dedup
  * family's dominant cost.
  */
object TextHashOps {
  val P: Long = TextFunctions.P

  /** Lowercase (Locale.ROOT — locale-independent, like Spark's lower()
    * and DuckDB's lower(); a tr_TR default locale must not change
    * hashes), split on ASCII whitespace runs (Java regex \s), and
    * polynomial-hash each token over its CODE POINTS — one pass, no
    * intermediate token/char arrays. NB: for non-BMP characters the
    * HOF form (split-per-code-unit + ascii()) differs; the pinned
    * native≡HOF equivalence covers BMP text, and the DuckDB oracle's
    * per-character ascii() matches the code-point form used here. */
  def tokenHashes(s: UTF8String): ArrayData = {
    val str = s.toString.toLowerCase(java.util.Locale.ROOT)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val len = str.length
    var i = 0
    var h = 0L
    var inTok = false
    while (i < len) {
      val cp = str.codePointAt(i)
      val ws = cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B ||
        cp == '\f' || cp == '\r'
      if (ws) {
        if (inTok) { out += h; h = 0L; inTok = false }
      } else {
        h = (h * 31L + cp) % P
        inTok = true
      }
      i += Character.charCount(cp)
    }
    if (inTok) out += h
    new GenericArrayData(out.toArray)
  }

  /** Fused shingle + k-minhash: every n-window's rolling hash feeds the
    * k running minima directly — no shingle array is ever built.
    * Element i is null when there are no windows (mirrors
    * minhashSigFold's P-sentinel → null). */
  def shingleMinhash(th: ArrayData, n: Int, k: Int): ArrayData = {
    val len = th.numElements()
    val mins = Array.fill(k)(P)
    val w = len - n + 1
    var i = 0
    while (i < w) {
      var sh = 0L
      var j = 0
      while (j < n) { sh = (sh * 31L + th.getLong(i + j)) % P; j += 1 }
      var q = 0
      while (q < k) {
        val v = (sh * (2L * q + 1L) + 12345L + 67890L * q) % P
        if (v < mins(q)) mins(q) = v
        q += 1
      }
      i += 1
    }
    val out = new Array[Any](k)
    var q = 0
    while (q < k) {
      out(q) = if (mins(q) < P) java.lang.Long.valueOf(mins(q)) else null
      q += 1
    }
    new GenericArrayData(out)
  }

  /** All n-window rolling hashes of a token-hash array (the shingle
    * list itself, for consumers that explode it — d09/d10/t09/x04);
    * same fold as [[shingleMinhash]]'s inner loop. Fewer than n tokens
    * → empty array (the HOF mirror's `.otherwise(array())`). */
  def shingles(th: ArrayData, n: Int): ArrayData = {
    val len = th.numElements()
    val w = len - n + 1
    if (w <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](w)
    var i = 0
    while (i < w) {
      var sh = 0L
      var j = 0
      while (j < n) { sh = (sh * 31L + th.getLong(i + j)) % P; j += 1 }
      out(i) = java.lang.Long.valueOf(sh)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Polynomial fold of a whole long array into one hash — the
    * order-sensitive document fingerprint (t04). */
  def foldHash(th: ArrayData): Long = {
    val n = th.numElements()
    var h = 0L
    var i = 0
    while (i < n) { h = (h * 31L + th.getLong(i)) % P; i += 1 }
    h
  }

  /** SimHash over token hashes in ONE traversal (the HOF form folds the
    * array once per bit). Hashes are non-negative (mod P). */
  def simhash(th: ArrayData, bits: Int): Long = {
    val n = th.numElements()
    val cnt = new Array[Long](bits)
    var i = 0
    while (i < n) {
      val h = th.getLong(i)
      var j = 0
      while (j < bits) { cnt(j) += (h >> j) & 1L; j += 1 }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) { if (2L * cnt(j) > n) out |= (1L << j); j += 1 }
    out
  }
}

case class TokenHashesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_hashes needs a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    TextHashOps.tokenHashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TextHashOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.tokenHashes($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenHashesExpr =
    copy(child = newChild)
}

case class ShingleMinhashExpr(child: Expression, n: Int, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_minhash needs array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextHashOps.shingleMinhash(input.asInstanceOf[ArrayData], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TextHashOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.shingleMinhash($c, $n, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleMinhashExpr =
    copy(child = newChild)
}

case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingles needs array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextHashOps.shingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TextHashOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.shingles($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

case class FoldHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fold_hash needs array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextHashOps.foldHash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TextHashOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.foldHash($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): FoldHashExpr =
    copy(child = newChild)
}

case class SimHashExpr(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash needs array<bigint>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TextHashOps.simhash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = TextHashOps.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.simhash($c, $bits);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

/** Column builders. */
object TextHashExprs {
  import org.apache.spark.sql.graftbridge.Bridge

  def token_hashes(c: Column): Column =
    Bridge.column(TokenHashesExpr(Bridge.expression(c)))
  def shingle_minhash(c: Column, n: Int, k: Int): Column =
    Bridge.column(ShingleMinhashExpr(Bridge.expression(c), n, k))
  def shingles_native(c: Column, n: Int): Column =
    Bridge.column(ShinglesExpr(Bridge.expression(c), n))
  def fold_hash(c: Column): Column =
    Bridge.column(FoldHashExpr(Bridge.expression(c)))
  def simhash_native(c: Column, bits: Int): Column =
    Bridge.column(SimHashExpr(Bridge.expression(c), bits))
}
