package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The engine's skew posture, pinned: joins rely on AQE's skew-join
  * splitting (this spec demonstrates it actually fires under our
  * session shape), aggregations on Salting.saltedSum (AQE does not
  * re-split skewed aggs — q29 gates the arithmetic; here we pin the
  * plan decomposition). */
class SkewSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join partition") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> (try Some(conf.get(k)) catch { case _: Exception => None })).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // one hot key holding ~95% of the fact side
      val fact = spark.range(200000)
        .select(when(col("id") < 190000, lit(0L)).otherwise(col("id")).as("k"),
          col("id").as("v"))
      val dim = spark.range(2000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = fact.join(dim, "k")
      // execute THIS plan instance (count() would build its own
      // QueryExecution and leave joined's adaptive plan un-finalized)
      assert(joined.collect().length > 0)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE skew-join split did not fire:\n${finalPlan.take(1200)}")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }

  test("saltedSum equals the unsalted aggregation exactly") {
    val df = spark.range(100000)
      .select((col("id") % 3).as("g"), (col("id") % 97).cast("double").as("x"))
    val salted = Salting.saltedSum(df, Seq(col("g")), col("g") + col("x").cast("long"),
        col("x").cast(Det.dec), buckets = 16, resultName = "s")
    val plain = df.groupBy("g").agg(sum(col("x").cast(Det.dec)).as("s"))
    assert(salted.collect().map(r => (r.getLong(0), r.getDecimal(1))).toMap ==
      plain.collect().map(r => (r.getLong(0), r.getDecimal(1))).toMap)
  }
}
