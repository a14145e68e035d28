package graft.queries

import graft.SparkSpec

/** The sketch queries self-gate (exact + within-bounds booleans in the
  * result itself — see ApproxQueries); these tests pin that the gate
  * columns actually come out true on real data. */
class ApproxSpec extends SparkSpec {

  test("x01 HLL distinct counts stay within 3·rsd of exact") {
    val r = Registry.queries("x01_approx_distinct")(spark, sf0001).collect().head
    assert(r.getAs[Boolean]("parts_ok"), s"parts out of bounds: $r")
    assert(r.getAs[Boolean]("supps_ok"), s"supps out of bounds: $r")
    assert(r.getAs[Long]("exact_parts") > 0)
  }

  test("x02 approx percentiles bracket the exact quantile band") {
    val r = Registry.queries("x02_approx_quantiles")(spark, sf0001).collect().head
    assert(r.getAs[Boolean]("p50_ok"), s"p50 out of bounds: $r")
    assert(r.getAs[Boolean]("p99_ok"), s"p99 out of bounds: $r")
  }

  test("correlationMatrix: chunked block-pair shape ≡ fused single-agg shape") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val panel = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def collectR(maxWidth: Int): Map[(String, String), (Long, Double)] =
      ApproxQueries.correlationMatrix(li, panel, maxWidth).collect()
        .map(r => (r.getAs[String]("c1"), r.getAs[String]("c2")) ->
          (r.getAs[Long]("n"), r.getAs[Double]("r"))).toMap
    val fused = collectR(maxWidth = 1000) // 1+16+28 = 45 ≤ 1000 ⇒ one agg
    val chunked = collectR(maxWidth = 10) // forces m=3 block pairs + base chunks
    assert(fused.size == panel.size * (panel.size - 1) / 2)
    // Det decimal moments make both shapes EXACTLY equal, bit for bit
    assert(chunked === fused)
  }
}
