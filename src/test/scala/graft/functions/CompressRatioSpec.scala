package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gate for compress_ratio (t23): DuckDB can't deflate, so instead of
  * an oracle hash the signal's defining properties are pinned —
  * ordering (repetitive < prose < noise), bounds, determinism, and
  * the SQL registration path. */
class CompressRatioSpec extends SparkSpec {
  import CompressRatioExprs.compress_ratio

  private def ratioOf(s: String): Double = {
    import spark.implicits._
    Seq(s).toDF("t").select(compress_ratio(col("t"))).collect().head.getDouble(0)
  }

  test("repetitive text compresses below prose, prose below noise") {
    val template = "click here to subscribe " * 100
    val prose = "the quick brown fox jumps over the lazy dog while a storm " +
      "gathers on the horizon and seven sailors watch from the harbor wall " * 8
    // a linear congruence compresses well — use a seeded PRNG for
    // genuinely high-entropy (still deterministic) bytes
    val rnd = new scala.util.Random(42)
    val noise = Seq.fill(2400)((rnd.nextInt(94) + 33).toChar).mkString
    val (rt, rp, rn) = (ratioOf(template), ratioOf(prose), ratioOf(noise))
    assert(rt < rp && rp < rn, s"ordering violated: $rt, $rp, $rn")
    assert(rt < 0.35, s"template should flag as repetitive, got $rt")
  }

  test("bounds: positive, ~1 for empty, small overhead ceiling") {
    assert(ratioOf("") == 1.0)
    val r = ratioOf("abc")
    assert(r > 0.0 && r < 4.0) // tiny inputs pay fixed overhead, bounded
    val rnd = new scala.util.Random(7)
    val noise = Seq.fill(10000)((rnd.nextInt(94) + 33).toChar).mkString
    assert(ratioOf(noise) < 1.2, "even incompressible input stays near 1")
  }

  test("deterministic: same input, same ratio, across repeated eval and rows") {
    import spark.implicits._
    val df = Seq.fill(50)("some repeated document body " * 20).toDF("t")
      .select(compress_ratio(col("t")).as("r"))
    assert(df.distinct().count() == 1)
    assert(ratioOf("xyz " * 50) == ratioOf("xyz " * 50))
  }

  // Golden values: raw-deflate at DEFAULT_COMPRESSION is a pure,
  // stable function of the bytes (classic zlib's output for a fixed
  // level/strategy hasn't changed across releases), so the exact
  // compressed byte counts are pinned — this fails if anyone touches
  // the level, strategy, nowrap flag, or the ratio definition, which
  // ordering/bounds tests would let slide. Expected values are
  // compressed_len / raw_len with the observed compressed sizes.
  // JDK builds linked against a different deflate implementation
  // (zlib-ng, Cloudflare zlib) legitimately emit different bytes at
  // the same settings — the canary `assume` cancels the golden pins
  // there (drift in OUR config still fails on classic-zlib boxes,
  // which includes this repo's CI box).
  test("golden ratios: exact deflate output pinned for fixed inputs") {
    val canary = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput("canary canary canary".getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](64)
      val n = d.deflate(buf); d.end(); n
    }
    assume(canary == 11,
      s"JVM deflate is not classic zlib (canary $canary bytes) — golden byte counts don't apply")
    assert(ratioOf("aaa bbb ccc " * 40) == 19.0 / 480.0)
    assert(ratioOf("the quick brown fox jumps over the lazy dog. " * 10) == 51.0 / 450.0)
    assert(ratioOf("hello world graft") == 19.0 / 17.0)
  }

  test("null-safe and registered as a SQL function") {
    graft.GraftSqlFunctions.register(spark)
    val rows = spark.sql(
      "SELECT compress_ratio(t) FROM VALUES ('aaa aaa aaa aaa'), (NULL) v(t)")
      .collect()
    assert(rows(0).getDouble(0) > 0.0)
    assert(rows(1).isNullAt(0))
  }

  test("t23 query runs over real documents with sane values") {
    val out = graft.queries.Registry.queries("t23_compress_ratio")(spark, sf0001)
    val rows = out.collect()
    assert(rows.length == 500)
    assert(rows.forall { r =>
      val v = r.getDouble(r.fieldIndex("ratio")); v > 0.0 && v < 2.0
    })
  }
}
