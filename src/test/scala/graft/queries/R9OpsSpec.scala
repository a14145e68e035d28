package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Property pins for the round-9 changes — invariants the oracle
  * hash-gates can't express (recall dominance, lineage-cut equivalence,
  * short-vector contract, streaming sink cap). */
class R9OpsSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sf0001, "embeddings")
    .select(col("vec_id"), col("embedding"))

  test("ivf-pq re-rank (v33) recall dominates the raw ivf-pq search cut to 5") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(VectorQueries.bruteKnn(spark, sf0001, 5))
    val raw = pairs(Registry.queries("v13_ivfpq_search")(spark, sf0001)
      .filter(col("rank") <= 5))
    val rr = pairs(Registry.queries("v33_ivfpq_rerank")(spark, sf0001))
    // the re-rank keeps every truth member the 20-deep shortlist
    // caught; the raw top-5 is a subset of that shortlist, so recall
    // can only go up
    assert((rr intersect truth).size >= (raw intersect truth).size,
      s"re-rank must never lose recall: rerank=${(rr intersect truth).size} raw=${(raw intersect truth).size}")
  }

  test("pagerank lineage cut per round changes nothing but the plan depth") {
    val pairs = DedupQueries.candidatePairsOf(
      DedupQueries.sigOf(Tables(spark, sf0001, "documents")
        .select(col("doc_id"), col("text"))))
    def rows(cutEvery: Int): Map[Long, (Long, Double)] =
      DedupQueries.dupPagerankOf(pairs, iters = 6, cutEvery = cutEvery)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val cut = rows(cutEvery = 1)
    val uncut = rows(cutEvery = Int.MaxValue)
    assert(cut.keySet == uncut.keySet)
    cut.foreach { case (id, (deg, pr)) =>
      val (udeg, upr) = uncut(id)
      assert(deg == udeg)
      // Det-decimal sums make each round exact, so cut ≡ uncut is
      // equality, not tolerance
      assert(pr == upr, s"doc $id: cut=$pr uncut=$upr")
    }
  }

  test("binary codes on short vectors: dims past the end are 0-bits, not errors") {
    // mirrors the DuckDB oracle's out-of-bounds NULL → CASE → 0, so
    // the dialect `quantize` statement behaves identically in both
    // engines on arbitrary user tables
    val df = spark.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, Seq(1.0f, -2.0f, 3.0f)),
      org.apache.spark.sql.Row(2L, Seq.empty[Float])),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    val out = VectorQueries.binaryCodes(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // 3-dim vector: bits (1,0,1) land MSB-first in the 32-bit lo half
    assert(out(1L) == ((java.lang.Long.parseLong("101", 2) << 29, 0L)))
    assert(out(2L) == ((0L, 0L)))
  }

  test("weighted-sampling gates emit wkey as DOUBLE (decimal stays internal)") {
    Seq("x10_weighted_sample", "x13_grouped_weighted_sample",
      "s39_dialect_weighted_sample", "s43_dialect_stratified_sample")
      .foreach { name =>
        val schema = Registry.queries(name)(spark, sf0001).schema
        assert(schema("wkey").dataType ==
          org.apache.spark.sql.types.DoubleType,
          s"$name wkey must be double, got ${schema("wkey").dataType}")
      }
  }
}
