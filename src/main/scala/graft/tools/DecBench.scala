package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Microbench for the Det-decimal aggregation hot path (q09 shape):
  * times variants of the 5-aggregate lineitem groupBy to attribute the
  * single-task wall between parquet decode, decimal casts and the
  * decimal sum buffer. Diagnostic only. */
object DecBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val dec38 = DecimalType(38, 6)
    val dec18 = DecimalType(18, 6)
    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      (1 to 3).foreach(_ => df.write.format("noop").mode("overwrite").save())
      println(f"$name%-28s ${(System.nanoTime() - t0) / 3e9}%.3f s/run")
    }
    val g = li.groupBy(col("l_returnflag"), col("l_linestatus"))
    time("scan-only count")(li.groupBy(col("l_returnflag"), col("l_linestatus")).count())
    time("5x double sums")(g.agg(
      sum(col("l_quantity")).as("a"),
      sum(col("l_extendedprice")).as("b"),
      sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("c"),
      avg(col("l_quantity")).as("d"),
      count(col("l_orderkey")).as("e")))
    time("1x dec38 sum")(g.agg(sum(col("l_quantity").cast(dec38)).as("a")))
    time("1x dec18 sum")(g.agg(sum(col("l_quantity").cast(dec18)).as("a")))
    time("q09 as-is (dec38)")(g.agg(
      graft.core.Det.dsum(col("l_quantity")).as("sum_qty"),
      graft.core.Det.dsum(col("l_extendedprice")).as("sum_base"),
      graft.core.Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc"),
      graft.core.Det.davg(col("l_quantity")).as("avg_qty"),
      graft.core.Det.cnt(col("l_orderkey")).as("count_order")))
    time("2x dec38 sums")(g.agg(
      sum(col("l_quantity").cast(dec38)).as("a"),
      sum(col("l_extendedprice").cast(dec38)).as("b")))
    time("3x dec38 sums")(g.agg(
      sum(col("l_quantity").cast(dec38)).as("a"),
      sum(col("l_extendedprice").cast(dec38)).as("b"),
      sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec38)).as("c")))
    time("3x dec38 sums no-product")(g.agg(
      sum(col("l_quantity").cast(dec38)).as("a"),
      sum(col("l_extendedprice").cast(dec38)).as("b"),
      sum(col("l_discount").cast(dec38)).as("c")))
    time("3x dec38 + 2 counts")(g.agg(
      sum(col("l_quantity").cast(dec38)).as("a"),
      sum(col("l_extendedprice").cast(dec38)).as("b"),
      sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec38)).as("c"),
      count(col("l_quantity")).as("d"),
      count(col("l_orderkey")).as("e")))
    time("q09 with dec18 casts")(g.agg(
      sum(col("l_quantity").cast(dec18)).cast(DoubleType).as("sum_qty"),
      sum(col("l_extendedprice").cast(dec18)).cast(DoubleType).as("sum_base"),
      sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec18)).cast(DoubleType).as("sum_disc"),
      (sum(col("l_quantity").cast(dec18)).cast(DoubleType) /
        count(col("l_quantity")).cast(DoubleType)).as("avg_qty"),
      count(col("l_orderkey")).cast(DoubleType).as("count_order")))
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.catalyst.expressions.UnscaledValue
    def unscaled(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      Bridge.column(UnscaledValue(Bridge.expression(c.cast(dec18))))
    time("3x long-unscaled sums")(g.agg(
      sum(unscaled(col("l_quantity"))).as("a"),
      sum(unscaled(col("l_extendedprice"))).as("b"),
      sum(unscaled(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("c")))
    time("3x DetSum128")(g.agg(
      graft.functions.DetSumExprs.det_sum(col("l_quantity")).cast(DoubleType).as("a"),
      graft.functions.DetSumExprs.det_sum(col("l_extendedprice")).cast(DoubleType).as("b"),
      graft.functions.DetSumExprs.det_sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(DoubleType).as("c")))
    time("3x sums cast-dec-noagg")(g.agg(
      sum(col("l_quantity").cast(dec18).cast(DoubleType)).as("a"),
      sum(col("l_extendedprice").cast(dec18).cast(DoubleType)).as("b"),
      sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(dec18).cast(DoubleType)).as("c")))
    spark.stop()
  }
}
