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

  test("every query has an oracle (sketch ops self-gate via bounds columns)") {
    // t23: DuckDB cannot deflate — gated by CompressRatioSpec.
    // (Documented in COVERAGE.md); anything else oracle-less is a bug.
    // (t25's scoring is oracle-gated via frozen nano-weights since r5;
    // training stays pinned by QualityClassifierSpec.)
    val allowed = Set("t23_compress_ratio")
    val noOracle = Registry.all.filter(_.oracle.isEmpty).map(_.name)
      .filterNot(allowed)
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
