package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Bloom-filter membership — the decontamination path when the
  * benchmark/blocklist side is too big to broadcast as a join's hashed
  * relation. A bloom of 1B 8-byte keys at 1% fpp is ~1.2 GB — one
  * serialized binary value shipped once per executor — where a
  * broadcast hash join over the same keys would need tens of GB of
  * hashed relation per task. False POSITIVES only (over-flagging is
  * the conservative direction for decontam); never false negatives.
  *
  * Wraps Spark's own codegen'd sketch expressions (BloomFilterAggregate
  * / BloomFilterMightContain — the pair behind runtime join filters),
  * which Spark registers for internal use only; exposed here as
  * DataFrame columns and (GraftSqlFunctions) SQL functions. Values are
  * xxhash64-reduced to the Long domain the sketch expects.
  */
object Bloom {

  /** Bits for an expected item count at a target false-positive rate
    * (the standard -n·ln(p)/ln(2)² sizing). */
  def numBits(expectedItems: Long, fpp: Double): Long =
    math.max(64L, math.ceil(
      -expectedItems.toDouble * math.log(fpp) / (math.log(2) * math.log(2))).toLong)

  /** Aggregate any column into a serialized bloom filter (BinaryType,
    * one row). Mergeable: partial sketches OR together map-side. */
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double = 0.01): Column =
    Bridge.column(new BloomFilterAggregate(
      Bridge.expression(xxhash64(c)),
      Literal(expectedItems), Literal(numBits(expectedItems, fpp))
    ).toAggregateExpression())

  /** Membership probe against a one-row/one-column sketch DataFrame
    * (built with [[bloomAgg]]). Planned as a scalar subquery — Spark
    * executes the sketch side ONCE and ships the result to every
    * probe task, exactly how its own runtime join filters inject
    * blooms (the analyzer rejects a plain column reference here). */
  def mightContain(bloom: org.apache.spark.sql.DataFrame, c: Column): Column =
    Bridge.column(BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        bloom.queryExecution.analyzed),
      Bridge.expression(xxhash64(c))))
}
