package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Tables

/** Accuracy bounds for the sketch operators vs exact answers. */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact at sf0.001") {
    val li = Tables(spark, sf0001, "lineitem")
    val exact = li.agg(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    val approx = Registry.queries("x01_approx_distinct")(spark, sf0001)
      .collect().head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("approx median brackets the exact median") {
    val li = Tables(spark, sf0001, "lineitem")
    val exact = li.stat.approxQuantile("l_extendedprice", Array(0.5), 0.001).head
    val p50 = Registry.queries("x02_approx_quantiles")(spark, sf0001)
      .collect().head.getDouble(0)
    assert(math.abs(p50 - exact) / exact < 0.02, s"p50 $p50 vs exact $exact")
  }
}
