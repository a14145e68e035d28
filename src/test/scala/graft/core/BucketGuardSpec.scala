package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{DedupQueries, VectorQueries}

/** Hot-bucket guard: a degenerate bucket (10k identical signatures)
  * must produce bounded candidate output — linear in the bucket size,
  * never the quadratic all-pairs — while below-threshold buckets keep
  * exact all-pairs semantics (bit-identical to the oracle-gated path).
  */
class BucketGuardSpec extends SparkSpec {

  test("10k identical-signature docs: candidate output bounded + connected") {
    val n = 10000
    val maxBucket = 64
    // identical text ⇒ identical minhash signature ⇒ every band key
    // collides ⇒ one bucket of 10k per band (all-pairs would be ~50M)
    val docs = spark.range(n)
      .select(col("id").as("doc_id"),
        lit("the same boilerplate crawl text repeated everywhere").as("text"))
    val pairs = DedupQueries.candidatePairsOf(DedupQueries.sigOf(docs), maxBucket).cache()
    val cnt = pairs.count()
    assert(cnt > 0)
    // bounded: ≤ n·maxBucket (chunked all-pairs + star), far below n²/2
    assert(cnt <= n.toLong * maxBucket,
      s"guard failed to bound candidates: $cnt > ${n.toLong * maxBucket}")
    // no silent drops: the connectivity star keeps the whole bucket one
    // component — rep (min doc_id = 0) pairs with every other member
    val starDegree = pairs.filter(col("doc_a") === 0L).count()
    assert(starDegree == (n - 1).toLong, s"star degree $starDegree != ${n - 1}")
    pairs.unpersist()
  }

  test("10k identical vectors: banded ANN candidates bounded + symmetric") {
    val n = 10000
    val maxBucket = 64
    val vec = (0 until 64).map(i => lit(0.25f + 0.01f * (i % 7)))
    val e = spark.range(n)
      .select(col("id").as("vec_id"), array(vec: _*).as("embedding"))
    val cand = VectorQueries.bandedCandidates(e, maxBucket = maxBucket).cache()
    val cnt = cand.count()
    assert(cnt > 0)
    // directed pairs: ≤ 2·n·maxBucket
    assert(cnt <= 2L * n * maxBucket,
      s"guard failed to bound ANN candidates: $cnt > ${2L * n * maxBucket}")
    // directed output keeps both orientations (ANN probes need rows
    // keyed by every q_id): every id appears as q_id at least once
    val qids = cand.select(countDistinct(col("q_id"))).head().getLong(0)
    assert(qids == n.toLong, s"only $qids of $n ids appear as q_id")
    cand.unpersist()
  }

  test("below threshold the guard is a no-op (exact all-pairs semantics)") {
    val docs = spark.range(40).select(col("id").as("doc_id"),
      concat(lit("doc body number "), col("id") % 5,
        lit(" with shared phrasing across groups of five")).as("text"))
    val sig = DedupQueries.sigOf(docs)
    val guarded = DedupQueries.candidatePairsOf(sig, maxBucket = BucketGuard.DefaultMaxBucket)
    val exact = DedupQueries.candidatePairsOf(sig, maxBucket = Int.MaxValue)
    assert(guarded.except(exact).isEmpty && exact.except(guarded).isEmpty)
    assert(exact.count() > 0)
  }

  test("star contraction is component-equal to the pair set (benign + hot)") {
    // 5 duplicate families of 8 + one hot 200-doc family under a tiny
    // maxBucket: components from boundedStars must equal components
    // from boundedPairs vertex-for-vertex — the contraction only
    // drops connectivity-redundant edges, never reachability
    val docs = spark.range(240).select(col("id").as("doc_id"),
      when(col("id") < 200, lit("hot boilerplate family text"))
        .otherwise(concat(lit("family "), col("id") % 5,
          lit(" shared duplicate body"))).as("text"))
    val sig = DedupQueries.sigOf(docs).cache()
    def comps(edges: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      ConnectedComponents.run(edges, "doc_a", "doc_b").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fromPairs = comps(DedupQueries.candidatePairsOf(sig, maxBucket = 64))
    val fromStars = comps(DedupQueries.candidateStarsOf(sig, maxBucket = 64))
    assert(fromPairs.nonEmpty && fromStars == fromPairs)
    // and the star edge list is the smaller one on the hot family
    val nPairs = DedupQueries.candidatePairsOf(sig, maxBucket = 64).count()
    val nStars = DedupQueries.candidateStarsOf(sig, maxBucket = 64).count()
    assert(nStars < nPairs, s"stars $nStars must undercut pairs $nPairs")
    // d19 itself: canonical pick over stars ≡ canonical pick over pairs
    val viaPairs = DedupQueries.canonicalPickFromPairs(docs,
      DedupQueries.candidatePairsOf(sig, maxBucket = 64))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted.toSeq
    val viaStars = DedupQueries.canonicalPickFromPairs(docs,
      DedupQueries.candidateStarsOf(sig, maxBucket = 64))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sorted.toSeq
    assert(viaStars == viaPairs)
    sig.unpersist()
  }

  test("oversized() reports exactly the degraded buckets") {
    val bands = spark.range(500)
      .select(col("id"), lit(0).as("band"),
        when(col("id") < 450, lit(7L)).otherwise(col("id")).as("bkey"))
    val hot = BucketGuard.oversized(bands, "id", maxBucket = 100).collect()
    assert(hot.length == 1)
    assert(hot.head.getAs[Long]("n") == 450L)
    assert(hot.head.getAs[Long]("rep") == 0L)
  }
}
