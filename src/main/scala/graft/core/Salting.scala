package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation.
  *
  * A hot grouping key funnels its whole partition through one task;
  * salting splits each key into `buckets` sub-keys for the first
  * (partial) aggregation, then re-aggregates without the salt. Works
  * for any algebraic aggregate (sum/count/min/max — pass the combine
  * step). AQE's skew-join handling covers joins; this covers
  * aggregation skew, which AQE does not re-split.
  *
  * The salt must be deterministic per row for the correctness gate —
  * callers pass a salt expression (e.g. a key column % buckets) rather
  * than rand().
  */
object Salting {

  /** sum(valueCol) by keyCols with salted partial aggregation.
    * Result equals the unsalted groupBy exactly (decimal-exact when
    * valueCol is decimal-cast, see graft.core.Det). */
  def saltedSum(df: DataFrame, keyCols: Seq[Column], salt: Column,
      valueCol: Column, buckets: Int, resultName: String): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(salt, lit(buckets)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum(valueCol).as("__partial"))
    partial
      .groupBy(keyCols: _*)
      .agg(sum(col("__partial")).as(resultName))
  }
}
