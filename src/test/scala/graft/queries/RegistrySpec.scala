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

  test("no gate output schema contains DecimalType (decimal-inside, double-out)") {
    // Det-decimal is the internal determinism device (t24 pattern);
    // a raw decimal OUTPUT column is the one surface where the
    // driver's hash canonicalization diverges from exact row equality
    // (the r8 s39/s43/x10/x13 reds). Enforce the discipline registry-
    // wide so that failure class cannot recur.
    val offenders = Registry.all.flatMap { q =>
      val bad = q.build(spark, sf0001).schema.fields.collect {
        case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] =>
          f.name
      }
      if (bad.isEmpty) None else Some(s"${q.name}(${bad.mkString(",")})")
    }
    assert(offenders.isEmpty, s"decimal-typed output columns: $offenders")
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
