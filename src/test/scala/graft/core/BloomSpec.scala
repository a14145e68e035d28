package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every planted key probes true") {
    val keys = spark.range(0, 1000).select(col("id"))
    val bloom = keys.agg(Bloom.bloomAgg(col("id"), 1000L).as("bf"))
    val misses = keys
      .filter(!Bloom.mightContain(bloom, col("id"))).count()
    assert(misses === 0L)
  }

  test("false-positive rate stays near the configured fpp") {
    val keys = spark.range(0, 1000).select(col("id"))
    val bloom = keys.agg(Bloom.bloomAgg(col("id"), 1000L).as("bf"))
    val probes = spark.range(10000, 30000).select(col("id"))
    val fps = probes.filter(Bloom.mightContain(bloom, col("id"))).count()
    // fpp = 0.01 over 20k disjoint probes → expect ~200; 5x margin
    assert(fps < 1000L, s"false-positive count $fps out of 20000")
  }

  test("SQL surface: bloom_agg + bloom_might_contain via scalar subquery") {
    graft.GraftSqlFunctions.register(spark)
    spark.range(0, 500).select(col("id").as("v"))
      .createOrReplaceTempView("bloom_bench")
    spark.range(0, 1000).select(col("id").as("v"))
      .createOrReplaceTempView("bloom_probe")
    val hits = spark.sql(
      """SELECT count(*) FROM bloom_probe
        |WHERE bloom_might_contain(
        |  (SELECT bloom_agg(v, 500) FROM bloom_bench), v)""".stripMargin)
      .head().getLong(0)
    // all 500 members hit (no false negatives); few FPs beyond
    assert(hits >= 500L && hits < 550L, s"hits = $hits")
  }
}
