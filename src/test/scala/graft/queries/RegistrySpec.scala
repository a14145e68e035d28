package graft.queries

import graft.SparkSpec

/** Smoke: every gated query plans and runs at sf0.001 (the driver's t1
  * tier); rowcounts sane; oracle entries exist. */
class RegistrySpec extends SparkSpec {

  test("gate names are unique (a duplicate would silently shadow in the maps)") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size,
      names.groupBy(identity).collect { case (n, xs) if xs.size > 1 => n }.mkString(","))
  }

  test("EVERY query has an oracle — zero exceptions since round 6") {
    // t23 was the last holdout (DuckDB cannot deflate); since round 6
    // its oracle joins the independently-generated golden fixture
    // (fixtures/t23_golden.parquet). Sketch ops self-gate via exact
    // columns + bounds booleans. An oracle-less query would regress
    // the driver gate to a weaker rows-only check — keep this at zero.
    val noOracle = Registry.all.filter(_.oracle.isEmpty).map(_.name)
    assert(noOracle.isEmpty, s"oracle-less queries: $noOracle")
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

  test("every registry query's short code appears in COVERAGE.md") {
    // doc drift was the most recurrent review finding — keep the
    // inventory doc complete by construction
    val cov = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("COVERAGE.md")), "UTF-8")
    val missing = Registry.all.map(_.name.split('_').head)
      .filterNot(code => s"\\b$code\\b".r.findFirstIn(cov).isDefined)
    assert(missing.isEmpty, s"queries absent from COVERAGE.md: $missing")
  }
}
