package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Recall/selectivity of the banded-LSH ANN path. LSH recall is
  * similarity-conditional — P(candidate) = 1−(1−p^r)^b with
  * p = 1−θ/π — so the test plants NEAR-DUPLICATE pairs (sim ≈ 0.98,
  * where the 4×8 signature promises ~97% recall) in a deterministic
  * random corpus, and asserts both sides of the tradeoff: planted
  * pairs are recovered, and the candidate set stays a small fraction
  * of n² (sub-quadratic selectivity). The sf tables' true top-5
  * neighbors sit at sim ≈ 0.3, where NO sub-quadratic scheme recalls
  * reliably — v03's exactness on its own semantics is oracle-gated
  * instead. Also pins signature sizing (VERDICT r1: 8 planes alone ⇒
  * 256 buckets). */
class AnnRecallSpec extends SparkSpec {

  test("signature is at least 16 bits, banded for OR-amplification") {
    assert(VectorQueries.PLANES * VectorQueries.BANDS >= 16)
    assert(VectorQueries.BANDS >= 2)
  }

  test("banded candidates recall planted near-dups, stay sub-quadratic") {
    val dim = 64
    val nBase = 250
    val rng = new scala.util.Random(42)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val base = Array.fill(nBase)(unit(Array.fill(dim)(rng.nextGaussian())))
    // planted near-dup of vector i is vector i + nBase: noise norm
    // ≈ 0.025·√64 = 0.2 of a unit vector ⇒ sim ≈ 1/√1.04 ≈ 0.98
    val dups = base.map(v => unit(v.map(_ + 0.025 * rng.nextGaussian())))
    val rows = (base ++ dups).zipWithIndex.map { case (v, i) =>
      (i.toLong, v.map(_.toFloat).toSeq)
    }
    import spark.implicits._
    val e = rows.toSeq.toDF("vec_id", "embedding")
    val cand = VectorQueries.bandedCandidates(e)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until nBase).map(i => (i.toLong, (i + nBase).toLong))
    val recall = planted.count(p => cand.contains(p)).toDouble / nBase
    val n = 2L * nBase
    val selectivity = cand.size.toDouble / (n * (n - 1))
    info(f"planted near-dup recall: $recall%.3f, candidate selectivity: $selectivity%.4f")
    assert(recall >= 0.85, s"banded LSH missed planted near-dups: $recall")
    assert(selectivity <= 0.10, s"candidate set too dense: $selectivity")
  }
}
