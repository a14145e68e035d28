package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic aggregation helpers.
  *
  * Double sums are order-dependent: Spark's partial aggregation merges
  * partitions in nondeterministic order, so `sum(double)` can differ in
  * low bits run-to-run and engine-to-engine. Correctness-gated queries
  * therefore aggregate in fixed-point DECIMAL(38,6) (exact, associative,
  * commutative) and cast back to double — the DuckDB oracle does the
  * same cast chain, so the doubles are bit-identical on both sides.
  * Per-row double arithmetic (no reduction) is already deterministic
  * and needs no special handling.
  */
object Det {
  val dec: DecimalType = DecimalType(38, 6)

  /** Exact sum of a double column via decimal; result double.
    * Computed by [[graft.functions.DetSum128]] — the same exact
    * decimal(38,6) sum carried in two long limbs (bit-identical,
    * DetSumAggSpec), because Spark's precision-38 sum buffer is
    * BigDecimal-backed and costs ~3× the scan per aggregate.
    *
    * Contract bound (ADVICE r15): under NON-ANSI mode, rows with
    * 9.2e30 ≲ |x| < 1e32 (or a running sum past the hi limb) are
    * SKIPPED where `sum(cast(x as decimal(38,6)))` would still include
    * them — two orders of magnitude inside the decimal range. No
    * physical quantity this engine aggregates (token counts, prices,
    * quality scores, squared magnitudes thereof) reaches 1e30; under
    * ANSI both shapes error identically past 1e32. */
  def dsum(c: Column): Column =
    graft.functions.DetSumExprs.det_sum(c).cast(DoubleType)

  /** Deterministic mean: exact decimal sum, double division. */
  def davg(c: Column): Column = dsum(c) / count(c).cast(DoubleType)

  /** Dialect `count`: counts non-null, returns FLOAT
    * (reference selector.go:249, treeProcess.go:80-86). */
  def cnt(c: Column): Column = count(c).cast(DoubleType)

  private def n(c: Column): Column = count(c).cast(DoubleType)
  private def s(c: Column): Column = dsum(c)
  private def q(c: Column): Column =
    graft.functions.DetSumExprs.det_sum(c * c).cast(DoubleType)

  /** Deterministic sample stddev: exact decimal sums of x and x*x, then
    * a fixed double formula sqrt(greatest(q - s*s/n, 0)/(n-1)) mirrored
    * verbatim in the oracle SQL (same IEEE ops in the same order on
    * both engines). The greatest(,0) floor: the sums are exact, but
    * s*s/n rounds in doubles — a variance-0 group could land a hair
    * below zero at extreme magnitudes, which Spark sqrt()s into NaN
    * while DuckDB REJECTS; flooring keeps both engines on 0. */
  def stdevSamp(c: Column): Column =
    sqrt(greatest(q(c) - s(c) * s(c) / n(c), lit(0.0)) / (n(c) - lit(1.0)))

  /** Population stddev, same construction. */
  def stdevPop(c: Column): Column =
    sqrt(greatest(q(c) - s(c) * s(c) / n(c), lit(0.0)) / n(c))

  /** Oracle-side SQL fragments mirroring the helpers above. */
  object sql {
    def dsum(x: String): String =
      s"CAST(SUM(CAST(($x) AS DECIMAL(38,6))) AS DOUBLE)"
    def davg(x: String): String =
      s"(${dsum(x)} / CAST(COUNT($x) AS DOUBLE))"
    def cnt(x: String): String = s"CAST(COUNT($x) AS DOUBLE)"
    private def qq(x: String): String =
      s"CAST(SUM(CAST((($x) * ($x)) AS DECIMAL(38,6))) AS DOUBLE)"
    private def nn(x: String): String = s"CAST(COUNT($x) AS DOUBLE)"
    def stdevSamp(x: String): String =
      s"sqrt(greatest(${qq(x)} - ${dsum(x)} * ${dsum(x)} / ${nn(x)}, 0.0) / (${nn(x)} - 1.0))"
    def stdevPop(x: String): String =
      s"sqrt(greatest(${qq(x)} - ${dsum(x)} * ${dsum(x)} / ${nn(x)}, 0.0) / ${nn(x)})"
  }
}
