package graft.queries

import graft.SparkSpec

/** Smoke: every gated query plans and runs at sf0.001 (the driver's t1
  * tier); rowcounts sane; oracle entries exist. */
class RegistrySpec extends SparkSpec {

  test("every query has an oracle or is an explicitly rows-only sketch op") {
    val rowsOnly = Set("x01_approx_distinct", "x02_approx_quantiles")
    val noOracle = Registry.all.filter(_.oracle.isEmpty).map(_.name).toSet
    assert(noOracle == rowsOnly, s"unexpected oracle-less queries: ${noOracle -- rowsOnly}")
  }

  Registry.all.foreach { q =>
    test(s"${q.name} runs at sf0.001") {
      val n = q.build(spark, sf0001).count()
      assert(n >= 0)
    }
  }

  test("flagship entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
