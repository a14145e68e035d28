package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bounded top-k heap must be BIT-IDENTICAL to the rank-window
  * shape it replaced on the serving paths (row_number over
  * (metric, id) ≤ k), including double tie/NaN ordering and the
  * payload ride-along, across random data and both directions. */
class TopKAggSpec extends SparkSpec {

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int,
      asc: Boolean) = {
    val w = Window.partitionBy(col("g"))
      .orderBy(if (asc) col("m").asc else col("m").desc, col("id").asc)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("g"), col("id"), col("p"), col("rank").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).sorted.toSeq
  }

  private def viaHeap(df: org.apache.spark.sql.DataFrame, k: Int,
      asc: Boolean) =
    df.groupBy(col("g"))
      .agg(TopKExprs.top_k_by(col("id"), col("m"), col("p"), k, asc).as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("pos", "hit")))
      .select(col("g"), col("hit.id"), col("hit.payload"),
        (col("pos") + 1).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3))).sorted.toSeq

  test("heap top-k ≡ rank window on random doubles, both directions, many k") {
    val rnd = new java.util.Random(14L)
    import spark.implicits._
    val rows = (0 until 20000).map { i =>
      (rnd.nextInt(37).toLong, i.toLong, rnd.nextDouble() * 2 - 1)
    }
    val df = rows.toDF("g", "id", "m").withColumn("p", col("m") * 2)
      .localCheckpoint(true)
    for (k <- Seq(1, 7, 64); asc <- Seq(true, false)) {
      val w = viaWindow(df, k, asc)
      val h = viaHeap(df, k, asc)
      assert(h == w, s"heap != window at k=$k asc=$asc")
    }
  }

  test("tie and NaN ordering match Spark's double order exactly") {
    import spark.implicits._
    // duplicate metrics (ties -> id asc) plus NaN (greatest) and ±0.0
    val rows = Seq(
      (1L, 10L, 1.0), (1L, 3L, 1.0), (1L, 7L, 1.0),
      (1L, 2L, Double.NaN), (1L, 5L, 0.0), (1L, 6L, -0.0),
      (1L, 9L, Double.PositiveInfinity), (1L, 8L, Double.NegativeInfinity))
    val df = rows.toDF("g", "id", "m").withColumn("p", lit(0.5))
    for (k <- Seq(3, 5, 8); asc <- Seq(true, false)) {
      val w = viaWindow(df, k, asc).map(t => (t._1, t._2, t._4))
      val h = viaHeap(df, k, asc).map(t => (t._1, t._2, t._4))
      assert(h == w, s"tie/NaN order diverged at k=$k asc=$asc: $h vs $w")
    }
  }

  test("int-typed ids and long payloads round-trip through the heap") {
    import spark.implicits._
    val df = (0 until 500).map(i => (i % 5, i, i.toDouble % 13, i.toLong * 3))
      .toDF("g", "id", "m", "p")
    val got = df.groupBy(col("g"))
      .agg(TopKExprs.top_k_by(col("id"), col("m"), col("p"), 4, asc = true).as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("pos", "hit")))
      .select(col("g"), col("hit.id"), col("hit.payload"))
    assert(got.schema("id").dataType.typeName == "integer")
    assert(got.schema("payload").dataType.typeName == "long")
    val rows = got.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(rows.length == 20)
    assert(rows.forall { case (_, id, p) => p == id.toLong * 3 })
  }

  test("partial heaps merge exactly (repartitioned input ≡ single partition)") {
    val rnd = new java.util.Random(7L)
    import spark.implicits._
    val rows = (0 until 5000).map(i => (i % 11L, i.toLong, rnd.nextDouble()))
    val one = rows.toDF("g", "id", "m").withColumn("p", col("m"))
      .coalesce(1)
    val many = rows.toDF("g", "id", "m").withColumn("p", col("m"))
      .repartition(16)
    assert(viaHeap(one, 9, asc = false) == viaHeap(many, 9, asc = false),
      "merge order must not affect the kept set")
  }
}
