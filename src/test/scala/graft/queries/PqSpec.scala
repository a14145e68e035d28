package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PQ quality gates: ADC top-k (v10) must beat random retrieval by a
  * wide margin, and exact re-ranking of the ADC shortlist (v11) must
  * dominate pure ADC — everything is deterministic (hash seeds, fixed
  * iterations), so these recalls are fixed numbers, pinned with slack.
  * Random baseline here is 10/495 ≈ 0.02. */
class PqSpec extends SparkSpec {

  private def topk(name: String): Map[Long, Set[Long]] =
    Registry.queries(name)(spark, sf0001)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap

  private lazy val exact: Map[Long, Set[Long]] = {
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val db = e.filter(col("vec_id") >= 5)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val l2 = aggregate(
      zip_with(col("q_emb"), col("n_emb"),
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(l2.asc, col("n_id").asc)
    db.join(broadcast(q))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
      .select(col("q_id"), col("n_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
  }

  private def avgRecall(got: Map[Long, Set[Long]]): Double = {
    val rs = exact.map { case (qid, want) =>
      got.getOrElse(qid, Set.empty).intersect(want).size.toDouble / want.size
    }
    rs.sum / rs.size
  }

  test("SQ search recall is near-exact (8 bits/dim loses almost nothing)") {
    // the SQ trade vs PQ: 4x compression instead of 32x, but per-dim
    // quantization error is tiny — asymmetric search should agree
    // with exact L2 almost everywhere
    val r = avgRecall(topk("v16_sq_search"))
    info(s"avg SQ recall@10 = $r")
    assert(r >= 0.9, s"SQ asymmetric search recall collapsed: $r")
  }

  test("ADC top-10 recall beats random retrieval by >=10x") {
    val r = avgRecall(topk("v10_pq_adc_topk"))
    info(s"avg ADC recall@10 = $r")
    assert(r >= 0.2, s"PQ ADC recall collapsed: $r")
  }

  test("IVF-PQ search holds most of flat-ADC recall scanning only probed cells") {
    // the IVF trade: top-2 of 4 probed cells → ADC touches ~half the
    // codes; finer residual quantization claws back most of what the
    // unprobed cells lose (measured 0.26 vs 0.30 flat — deterministic)
    val flat = avgRecall(topk("v10_pq_adc_topk"))
    val ivf = avgRecall(topk("v13_ivfpq_search"))
    info(s"avg IVF-PQ recall@10 = $ivf (flat ADC $flat)")
    assert(ivf >= 0.2, s"IVF-PQ recall collapsed: $ivf")
    assert(ivf >= flat - 0.1, s"probing loses too much: $ivf vs flat $flat")
  }

  test("exact re-rank of the ADC shortlist dominates pure ADC") {
    val adc = avgRecall(topk("v10_pq_adc_topk"))
    val rer = avgRecall(topk("v11_pq_rerank"))
    info(s"avg rerank recall@10 = $rer (ADC $adc)")
    // guaranteed: every true neighbor the shortlist catches survives
    // exact re-ranking, so rerank recall can never fall below ADC's
    assert(rer >= adc)
    assert(rer >= 0.4, s"rerank recall collapsed: $rer")
  }
}
