package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of: latest right row at-or-before each left row") {
    val left = Seq((1L, 10L, 100L), (1L, 25L, 101L), (2L, 5L, 102L))
      .toDF("k", "t", "lid").select(col("k"), to_timestamp(col("t")).as("t"), col("lid"))
    val right = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (2L, 7L, 3.0))
      .toDF("k", "t", "v").select(col("k"), to_timestamp(col("t")).as("t"), col("v"))
    val out = AsofJoin.backward(left, right, "k", "t", Seq("t", "v"), prefix = "r_")
      .select(col("lid"), col("r_v")).collect().map(r =>
        (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Double]))).toMap
    // equal timestamps match (inclusive): left (1, t=10) sees right (1, t=10)
    assert(out(100L) === Some(1.0))
    // latest preceding, not first: left (1, t=25) sees t=20 not t=10
    assert(out(101L) === Some(2.0))
    // no right row at-or-before → null (left-outer semantics)
    assert(out(102L) === None)
  }

  test("tiebreak: among right rows sharing (key, ts) the greatest wins") {
    val left = Seq((1L, 10L)).toDF("k", "t")
      .select(col("k"), to_timestamp(col("t")).as("t"))
    val right = Seq((1L, 10L, 7L, 1.0), (1L, 10L, 9L, 2.0), (1L, 10L, 8L, 3.0))
      .toDF("k", "t", "id", "v")
      .select(col("k"), to_timestamp(col("t")).as("t"), col("id"), col("v"))
    val out = AsofJoin.backward(left, right, "k", "t", Seq("v"),
      tiebreak = Some("id")).select(col("asof_v")).collect()
    assert(out.map(_.getDouble(0)).toSeq === Seq(2.0))
  }

  test("plan: one hash exchange on the key, no cartesian/range join") {
    val left = spark.range(100).select((col("id") % 10).as("k"),
      to_timestamp(col("id")).as("t"), col("id").as("lid"))
    val right = spark.range(50).select((col("id") % 10).as("k"),
      to_timestamp(col("id") * 2).as("t"), col("id").cast("double").as("v"))
    val plan = AsofJoin.backward(left, right, "k", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, plan)
  }
}
