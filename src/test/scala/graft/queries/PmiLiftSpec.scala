package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** t24's exact-integer lift has a bounded exactness domain
  * (c12·n_tok²·10⁶ < 10³⁸). Inside it the decimal math is exact;
  * outside it Spark's non-ANSI decimal overflow would silently null
  * the largest lifts out of the ordered top-k while DuckDB throws —
  * so the builder turns the overflow sentinel into a loud error. */
class PmiLiftSpec extends SparkSpec {

  private def statsRow(c12: Long, nTok: Long, c1a: Long, c1b: Long, nBig: Long) = {
    import spark.implicits._
    Seq((c12, nTok, c1a, c1b, nBig))
      .toDF("c12", "n_tok", "c1_w1", "c1_w2", "n_big")
  }

  test("lift is exact inside the domain") {
    // 7 * 1000^2 * 1e6 / (20 * 30 * 900) truncates like DuckDB `//`
    val got = statsRow(7L, 1000L, 20L, 30L, 900L)
      .select(TextQueries.guardedLiftPpm.as("lift"))
      .collect()(0).getLong(0)
    assert(got == 7L * 1000L * 1000L * 1000000L / (20L * 30L * 900L))
  }

  test("exactness holds at the documented 1.5 TB-corpus edge") {
    // n_tok = 2e11, Zipfian c12 = 1% of n_tok: numerator 8e37 < 1e38
    val nTok = 200000000000L
    val c12 = nTok / 100
    val got = statsRow(c12, nTok, nTok / 50, nTok / 50, nTok - 1)
      .select(TextQueries.guardedLiftPpm.as("lift"))
      .collect()(0).getLong(0)
    // lift = c12·T²·1e6/(c1²·n_big) ≈ 0.01·1e6·2500/(1-ulp) — sanity
    // bound rather than a second big-int derivation
    assert(got > 24900000L && got < 25100000L, got)
  }

  test("overflow past the domain is loud, never a silent null") {
    // n_tok = 2e12 with c12 = 1% of n_tok: numerator 8e40 > 1e38.
    // Under ANSI (Spark 4's default) the decimal multiply itself
    // throws; under non-ANSI the null sentinel hits the raise_error
    // guard. Either way: an error, not a reordered top-k.
    val nTok = 2000000000000L
    val e = intercept[Exception] {
      statsRow(nTok / 100, nTok, nTok / 50, nTok / 50, nTok - 1)
        .select(TextQueries.guardedLiftPpm.as("lift"))
        .collect()
    }
    assert(msgs(e).exists(m => m != null &&
        (m.contains("t24 lift overflow") ||
          m.contains("NUMERIC_VALUE_OUT_OF_RANGE"))),
      e.toString)
  }

  test("overflow is loud under non-ANSI mode too (raise_error guard)") {
    val nTok = 2000000000000L
    withSQLConf("spark.sql.ansi.enabled" -> "false") {
      val e = intercept[Exception] {
        statsRow(nTok / 100, nTok, nTok / 50, nTok / 50, nTok - 1)
          .select(TextQueries.guardedLiftPpm.as("lift"))
          .collect()
      }
      assert(msgs(e).exists(m => m != null && m.contains("t24 lift overflow")),
        e.toString)
    }
  }

  /** Exception message chain (self + causes). */
  private def msgs(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))

  private def withSQLConf[A](kvs: (String, String)*)(f: => A): A = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
