package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit gates for the bounded_bucket capped-collect aggregate: exact
  * count/rep regardless of cap, member completeness iff n ≤ cap, and
  * stability across partial/final merges (the shuffle path exercises
  * serialize/deserialize/merge). */
class BucketAggSpec extends SparkSpec {
  import graft.functions.BucketAggExprs.bounded_bucket

  test("exact n and min rep; members complete when n <= cap") {
    val df = spark.range(100)
      .select((col("id") % 3).as("g"), col("id"))
      .repartition(8) // force partial buffers + merge across partitions
      .groupBy("g")
      .agg(bounded_bucket(col("id"), 64).as("b"))
      .select(col("g"), col("b.n"), col("b.rep"), size(col("b.members")).as("m"))
      .collect()
    assert(df.length == 3)
    df.foreach { r =>
      val g = r.getLong(0)
      assert(r.getLong(1) == (if (g == 0) 34 else 33), r.toString) // 0..99 % 3
      assert(r.getLong(2) == g, "rep must be the exact min id")
      assert(r.getInt(3) == r.getLong(1), "members must be complete under cap")
    }
  }

  test("cap bounds members while n and rep stay exact") {
    val r = spark.range(10000)
      .select(lit(1).as("g"), col("id"))
      .repartition(16)
      .groupBy("g")
      .agg(bounded_bucket(col("id"), 32).as("b"))
      .select(col("b.n"), col("b.rep"), size(col("b.members")).as("m"))
      .head()
    assert(r.getLong(0) == 10000L)
    assert(r.getLong(1) == 0L)
    assert(r.getInt(2) == 32, "members must cap at exactly `cap`")
  }

  test("non-bigint id is a clear analysis error") {
    val e = intercept[Exception] {
      spark.range(5).select(lit("x").as("s"))
        .agg(bounded_bucket(col("s"), 8)).collect()
    }
    assert(e.getMessage.contains("bounded_bucket") ||
      Option(e.getCause).exists(_.getMessage.contains("bounded_bucket")),
      e.getMessage)
  }
}
