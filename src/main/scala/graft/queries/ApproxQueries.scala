package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Approximate/sketch operators — the 100 TB scale path next to the
  * exact forms (HLL instead of exact count-distinct's full shuffle of
  * keys; t-digest quantiles instead of a global sort). Sketches are
  * engine-specific, so there is no DuckDB hash oracle — the driver
  * records the weaker rows-only check; accuracy bounds are asserted in
  * ApproxSpec against the exact answers. */
object ApproxQueries {
  val all: Seq[Q] = Seq(

    Q("x01_approx_distinct",
      (s, dir) => Tables(s, dir, "lineitem").agg(
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"),
        approx_count_distinct(col("l_suppkey"), rsd = 0.02).as("approx_supps")),
      None),

    Q("x02_approx_quantiles",
      (s, dir) => Tables(s, dir, "lineitem").agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("p99")),
      None)
  )
}
