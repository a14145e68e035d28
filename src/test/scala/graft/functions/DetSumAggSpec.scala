package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** DetSum128 (long-limb exact decimal sum) must be bit-identical to
  * `sum(cast(x as decimal(38,6)))` — the Det.dsum contract every
  * hash-gated aggregate rides on — on every input shape: mixed signs
  * and magnitudes, values crossing the compact-limb boundary (|x| ≥
  * 1e12 routes to the wide decimal branch), nulls, all-null groups,
  * empty frames, and any partitioning (the merge path). */
class DetSumAggSpec extends SparkSpec {
  import spark.implicits._

  private val dec38 = DecimalType(38, 6)

  private def check(xs: Seq[Option[Double]], parts: Int = 4): Unit = {
    val df = xs.zipWithIndex
      .map { case (x, i) => (i.toLong % 3, x) }.toDF("g", "x")
      .repartition(parts)
    val ref = df.groupBy("g")
      .agg(sum(col("x").cast(dec38)).cast(DoubleType).as("s"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val got = df.groupBy("g")
      .agg(DetSumExprs.det_sum(col("x")).cast(DoubleType).as("s"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == ref, s"mismatch: $got vs $ref")
    // and as exact decimals, not just doubles
    val refD = df.agg(sum(col("x").cast(dec38)).as("s")).collect()(0)
    val gotD = df.agg(DetSumExprs.det_sum(col("x")).as("s")).collect()(0)
    assert((refD.isNullAt(0) && gotD.isNullAt(0)) ||
      refD.getDecimal(0).compareTo(gotD.getDecimal(0)) == 0,
      s"decimal mismatch: ${gotD} vs ${refD}")
  }

  test("mixed magnitudes and signs, bit-identical to sum(cast(x as dec(38,6)))") {
    val rng = new scala.util.Random(42)
    check((0 until 5000).map(_ => Some((rng.nextDouble() - 0.5) * 1e6)))
    check((0 until 5000).map(i => Some(rng.nextDouble() * math.pow(10, i % 14 - 7))))
  }

  test("values beyond the compact limb (|x| >= 1e12) take the wide branch exactly") {
    val rng = new scala.util.Random(7)
    val xs = (0 until 2000).map { i =>
      if (i % 17 == 0) Some((rng.nextDouble() - 0.5) * 1e15) // wide
      else Some((rng.nextDouble() - 0.5) * 1e9) // compact
    }
    check(xs)
    check(Seq(Some(1e12), Some(-1e12), Some(999999999999.999999),
      Some(1e20), Some(-1e20), Some(0.0000005), Some(-0.0000005)))
  }

  test("nulls skipped; all-null and empty groups are null; any partitioning") {
    check(Seq(Some(1.5), None, Some(2.5), None, None, Some(-4.0)), parts = 1)
    check(Seq(Some(1.5), None, Some(2.5), None, None, Some(-4.0)), parts = 7)
    check(Seq(None, None, None))
    check(Seq.empty)
  }

  test("negative/positive cancellation across limb boundaries") {
    // sums that repeatedly cross 0 and +-10^18 unscaled exercise the
    // carry arithmetic in update AND merge
    val xs = (0 until 4000).map(i =>
      Some(if (i % 2 == 0) 9e11 else -9e11 + 0.000001))
    check(xs, parts = 13)
  }

  test("non-ANSI: rows whose (38,6) cast nulls are skipped, like sum(cast)") {
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      // 1e35 overflows decimal(38,6) -> null under non-ANSI -> skipped
      check(Seq(Some(1.5), Some(1e35), Some(2.5)))
      check(Seq(Some(1e35), Some(Double.NaN)))
    } finally spark.conf.unset("spark.sql.ansi.enabled")
  }

  test("NaN/Inf behave exactly like sum(cast) under the session's cast mode") {
    // whatever the session's ANSI/cast semantics, DetSum128's wide
    // branch is the same (38,6) Cast — result or exception must match
    def run(body: => org.apache.spark.sql.Row): Either[String, String] =
      try Right(String.valueOf(body))
      catch { case e: Exception => Left(e.getClass.getName) }
    for (bad <- Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)) {
      val df = Seq(Some(1.0), Some(bad)).toDF("x").repartition(2)
      val ref = run(df.agg(sum(col("x").cast(dec38)).as("s")).collect()(0))
      val got = run(df.agg(DetSumExprs.det_sum(col("x")).as("s")).collect()(0))
      assert(got == ref, s"$bad: $got vs $ref")
    }
  }

  test("float and integral children match the cast chain too") {
    val f = Seq(1.5f, -2.25f, 3.75f).toDF("x").repartition(2)
    val rf = f.agg(sum(col("x").cast(dec38)).as("s")).collect()(0).getDecimal(0)
    val gf = f.agg(DetSumExprs.det_sum(col("x")).as("s")).collect()(0).getDecimal(0)
    assert(rf.compareTo(gf) == 0)
    val l = Seq(5000000000000L, -1L, 7L).toDF("x").repartition(2)
    val rl = l.agg(sum(col("x").cast(dec38)).as("s")).collect()(0).getDecimal(0)
    val gl = l.agg(DetSumExprs.det_sum(col("x")).as("s")).collect()(0).getDecimal(0)
    assert(rl.compareTo(gl) == 0)
  }
}
