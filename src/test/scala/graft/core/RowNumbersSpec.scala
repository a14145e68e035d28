package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RowNumbersSpec extends SparkSpec {

  test("global row numbers match the single-partition window result") {
    val df = Tables(spark, sf0001, "customer")
    val got = RowNumbers.global(df, Seq(col("c_custkey")), "rn", step = 1.0,
      numPartitions = Some(7))
      .select(col("c_custkey"), col("rn")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val want = df.select(col("c_custkey")).collect().map(_.getLong(0)).sorted
      .zipWithIndex.map { case (k, i) => (k, (i + 1).toDouble) }
    assert(got.sameElements(want))
  }

  test("step scales the numbering") {
    val df = Tables(spark, sf0001, "region")
    val got = RowNumbers.global(df, Seq(col("r_regionkey")), "rn", step = 0.5)
      .select(col("rn")).collect().map(_.getDouble(0)).sorted
    assert(got.sameElements(Array(0.5, 1.0, 1.5, 2.0, 2.5)))
  }
}
