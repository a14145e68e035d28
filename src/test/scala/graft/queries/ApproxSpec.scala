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
}
