package graft.queries

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Multi-probe IVF (v07) exists to recover neighbors that single-probe
  * (v05) loses when a query sits near a cell boundary: its true
  * neighbors can be assigned to the runner-up cell, which v05 never
  * visits. The spec measures recall of both against the exact v01
  * brute-force baseline on the sf0.001 table and asserts multi-probe
  * strictly dominates (≥ everywhere, and it must find at least as many
  * exact-top-5 neighbors in total). */
class IvfRecallSpec extends SparkSpec {

  private def top5(name: String): Map[Long, Set[Long]] =
    Registry.queries(name)(spark, sf0001)
      .filter(org.apache.spark.sql.functions.col("rank") <= 5)
      .select("q_id", "n_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  test("multi-probe recall vs exact top-5 dominates single-probe") {
    val exact = top5("v01_knn_brute")
    val single = top5("v05_ivf_search")
    val multi = top5("v07_ivf_multiprobe")
    val (sHits, mHits) = exact.keys.toSeq.map { q =>
      val e = exact(q)
      (single.getOrElse(q, Set.empty[Long]).count(e), multi.getOrElse(q, Set.empty[Long]).count(e))
    }.unzip
    info(s"exact-top5 hits per query — single-probe: $sHits, multi-probe: $mHits")
    sHits.zip(mHits).foreach { case (s1, m1) =>
      assert(m1 >= s1, "multi-probe must never recall fewer exact neighbors")
    }
    assert(mHits.sum >= sHits.sum)
    // multi-probe visits 2 cells: candidate lists can only grow
    assert(multi.values.map(_.size).sum >= single.values.map(_.size).sum)
  }
}
