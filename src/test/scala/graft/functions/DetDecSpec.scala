package graft.functions

import java.math.RoundingMode

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** DetDec.unscaled6 must equal the unscaled long of Spark's
  * `cast(x as decimal(18,6))` — i.e. of
  * `java.math.BigDecimal.valueOf(x).setScale(6, HALF_UP)` — for every
  * double in the compact range |x| < 1e11. The fast path's soundness
  * argument (round-trip interval strictly inside one rounding cell)
  * is exercised at exactly the places it can break: half-boundaries,
  * shortest-representation ties, the 4e9 fast/slow cutoff, subnormals,
  * and the compact-range edge. */
class DetDecSpec extends SparkSpec {
  import spark.implicits._

  private def ref(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  private def checkOne(x: Double): Unit = {
    val got = DetDec.unscaled6(x)
    val want = ref(x)
    assert(got == want, s"unscaled6($x): $got != $want " +
      s"(repr=${java.lang.Double.toString(x)})")
  }

  test("adversarial values: half-boundaries, repr ties, cutoffs") {
    val cases = Seq(
      0.0, -0.0, 1.0, -1.0, 0.1, 0.3, 2.675, // classic repr traps
      1.0000005, -1.0000005, 2.0000005, 0.0000005, -0.0000005,
      0.0000015, 0.0000025, 1.5e-6, 2.5e-6, 4.9999999999e-7,
      1e-300, -1e-300, Double.MinPositiveValue, -Double.MinPositiveValue,
      123456.789012, 999999.9999995, 1000000.0000005,
      3.999999999e9, 4.0e9, 4.000000001e9, // fast/slow cutoff
      9.9999999999e10, 1e11 - 1e-5, 1.23456789012e10, 5.4321e10,
      math.pow(2, 30), math.pow(2, 31), math.pow(2, 52) * 1e-8,
      7.2057594037927936e9 // 2^56 / 1e-7-ish mantissa edge
    )
    for (x <- cases; v <- Seq(x, Math.nextUp(x), Math.nextDown(x)))
      checkOne(v)
    // every representable neighborhood of a .0000005 half-boundary
    for (k <- -2000 to 2000) {
      val h = (k.toLong * 10 + 5) / 1e7 // (k + 0.5)·1e-6 as a double
      for (v <- Seq(h, Math.nextUp(h), Math.nextDown(h),
        Math.nextUp(Math.nextUp(h)), Math.nextDown(Math.nextDown(h))))
        checkOne(v)
    }
  }

  test("randomized sweep across the full compact range") {
    val rng = new scala.util.Random(20260819)
    var i = 0
    while (i < 2000000) {
      // log-uniform magnitude from 1e-12 to 1e11, both signs
      val mag = math.pow(10.0, rng.nextDouble() * 23 - 12)
      val x = (if (rng.nextBoolean()) mag else -mag) * rng.nextDouble()
      if (math.abs(x) < 1e11) checkOne(x)
      i += 1
    }
    // and a dense integer-scaled band (price-like data: k/100, k/1e6)
    var k = -200000
    while (k <= 200000) {
      checkOne(k / 100.0)
      checkOne(k / 1e6)
      k += 1
    }
  }

  test("agrees with Spark's cast(x as decimal(18,6)) end-to-end") {
    val rng = new scala.util.Random(7)
    val xs = (0 until 20000).map { i =>
      if (i % 7 == 0) (i - 10000) / 1e6
      else (rng.nextDouble() - 0.5) * math.pow(10, i % 21 - 9)
    } ++ Seq(1.0000005, 0.0000005, -0.0000005, 3.999999999e9, 4.1e9)
    val df = xs.toDF("x")
    val rows = df.select(col("x"),
      unscaled_long(col("x").cast(DecimalType(18, 6))).as("u")).collect()
    rows.foreach { r =>
      val x = r.getDouble(0)
      assert(DetDec.unscaled6(x) == r.getLong(1),
        s"cast mismatch at $x: ${DetDec.unscaled6(x)} != ${r.getLong(1)}")
    }
  }

  private def unscaled_long(c: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.catalyst.expressions.UnscaledValue
    Bridge.column(UnscaledValue(Bridge.expression(c)))
  }
}
