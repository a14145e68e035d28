package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Property pins for the round-8 operators — invariants the oracle
  * hash-gates can't express (bounds, symmetry, monotonicity). */
class R8OpsSpec extends SparkSpec {

  private lazy val docs =
    Tables(spark, sf0001, "documents").select(col("doc_id"), col("text"))
  private lazy val emb = Tables(spark, sf0001, "embeddings")
    .select(col("vec_id"), col("embedding"))

  test("binary codes: each half in [0, 2^32); hamming(a,a) = 0 and symmetric") {
    val codes = VectorQueries.binaryCodes(emb).collect()
    assert(codes.nonEmpty)
    assert(codes.forall { r =>
      val lo = r.getLong(1); val hi = r.getLong(2)
      lo >= 0 && lo < (1L << 32) && hi >= 0 && hi < (1L << 32)
    })
    // hamming distance properties on the first few codes
    val cs = codes.take(10).map(r => (r.getLong(1), r.getLong(2)))
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    cs.foreach(c => assert(ham(c, c) == 0))
    for (a <- cs; b <- cs) {
      assert(ham(a, b) == ham(b, a))
      assert(ham(a, b) <= 64)
    }
  }

  test("hamming top-k never exceeds k per query; distances ascend with rank") {
    val r = VectorQueries.hammingTopk(emb, 7).collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(3)))
    val perQ = r.groupBy(_._1)
    assert(perQ.nonEmpty && perQ.values.forall(_.length <= 7))
    perQ.values.foreach { rows =>
      val byRank = rows.sortBy(_._3).map(_._2)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b },
        "hamming distance must be non-decreasing in rank")
    }
  }

  test("hamming re-rank recall dominates the raw hamming top-k") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(VectorQueries.bruteKnn(spark, sf0001, 5))
    val raw = pairs(VectorQueries.hammingTopk(emb, 5))
    val rr = pairs(Registry.queries("v31_hamming_rerank")(spark, sf0001))
    assert(rr.size == raw.size)
    assert((rr intersect truth).size >= (raw intersect truth).size,
      s"re-rank must never lose recall: rerank=${(rr intersect truth).size} raw=${(raw intersect truth).size}")
  }

  test("dup-graph pagerank conserves mass and respects the damping floor") {
    val rows = Registry.queries("d18_dup_pagerank")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // closed undirected graph, no dangling nodes: every round
    // redistributes all mass, so Σ pagerank = n exactly (up to the
    // decimal rounding each round absorbs)
    val n = rows.length
    assert(math.abs(rows.map(_._3).sum - n) < 1e-3 * n,
      s"mass not conserved: sum=${rows.map(_._3).sum} n=$n")
    rows.foreach { case (id, deg, pr) =>
      assert(pr >= 0.15 - 1e-9, s"below damping floor: $id -> $pr")
      assert(deg >= 1)
    }
  }

  test("langid agreement: per-lang counts roll up to the corpus") {
    val rows = Registry.queries("t41_langid_agreement")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    val total = rows.map(_.getLong(1)).sum
    assert(total == graft.core.Tables(spark, sf0001, "documents").count())
  }

  test("stratified weighted sample: exactly min(n, group size) per group") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
    val r = ApproxQueries.groupedWeightedSample(docs, "source", "n_chars", 10)
      .collect()
    val sizes = docs.groupBy(col("source")).count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    val got = r.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    sizes.foreach { case (s0, n) =>
      assert(got.getOrElse(s0, 0) == math.min(10L, n),
        s"group $s0 expected ${math.min(10L, n)} rows, got ${got.getOrElse(s0, 0)}")
    }
  }

  test("token entropy is bounded: 0 <= H <= ln(n_types)") {
    val rows = TextQueries.tokenEntropy(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val types = r.getLong(2); val h = r.getDouble(3)
      assert(h >= -1e-9, s"negative entropy: $r")
      assert(h <= math.log(types.toDouble) + 1e-6,
        s"entropy above the uniform bound ln(n_types): $r")
    }
  }

  test("zipf slope is negative on the corpus (frequency falls with rank)") {
    val r = TextQueries.zipfSlope(docs).collect().head
    assert(r.getLong(0) > 10, "expected a non-trivial vocabulary")
    assert(r.getDouble(1) < 0.0, s"zipf slope should be negative: $r")
  }

  test("shingle novelty: the first doc is fully novel; ratios in [0,1]") {
    val rows = TextQueries.shingleNovelty(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nov = r.getDouble(3)
      assert(nov >= 0.0 && nov <= 1.0, s"novelty out of range: $r")
    }
    val firstId = rows.map(_.getLong(0)).min
    val first = rows.find(_.getLong(0) == firstId).get
    assert(first.getDouble(3) == 1.0,
      s"the earliest doc's shingles are all first-seen: $first")
  }

  test("weighted sample: heavier corpus halves win proportionally more slots") {
    // doubling every weight leaves the draw IDENTICAL (keys scale by
    // 1/2 uniformly -> same order)
    val base = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("n_chars"))
    val a = ApproxQueries.weightedSample(base, "n_chars", 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = ApproxQueries.weightedSample(
        base.withColumn("n_chars", col("n_chars") * 2), "n_chars", 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // not exactly invariant (decimal rounding of the key happens after
    // the division), but near-identical: allow a 10% boundary churn
    assert((a intersect b).size >= 45,
      s"uniform weight scaling should preserve the draw: ${(a diff b).size} churned")
  }

  test("rolling anomaly: warm-up rows (n_prev < 12) never flag") {
    val rows = Registry.queries("e22_rolling_anomaly")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.filter(_.getLong(3) < 12).foreach(r =>
      assert(!r.getBoolean(4), s"warm-up row flagged: $r"))
  }

  test("bounded funnel: qualified stages never exceed the unbounded funnel") {
    val rows = Registry.queries("e23_bounded_funnel")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // the time bound can only REMOVE conversions relative to raw
    // per-user click/purchase counts
    val raw = Tables(spark, sf0001, "events")
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("b"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (c, b) = raw(r.getLong(0))
      assert(r.getLong(2) <= c && r.getLong(3) <= b, s"bounded > raw: $r")
    }
  }

  test("LSH band sweep: more bands -> at least as many candidate slots") {
    val rows = Registry.queries("d17_lsh_band_sweep")(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows.keySet == Set(1L, 2L, 4L, 8L))
    // shorter band keys collide at least as often per band, and more
    // bands multiply the slots: the curve is non-decreasing in bands
    assert(rows(1L) <= rows(2L) * 2, "sanity: 1 band of 8 rows is strictest per band")
    assert(rows(2L) <= rows(4L) && rows(4L) <= rows(8L),
      s"candidate work should grow with band count: $rows")
  }

  test("k-means++ seeds are spread out: pairwise distinct, deterministic") {
    val s1 = VectorQueries.kmeansppSeeds(emb, 4)
    val s2 = VectorQueries.kmeansppSeeds(emb, 4)
    assert(s1.map(_._1) == Seq(0, 1, 2, 3))
    assert(s1.zip(s2).forall { case ((_, a), (_, b)) => a.sameElements(b) },
      "maxmin seeding must be bit-reproducible")
    for (i <- s1.indices; j <- s1.indices if i < j)
      assert(!s1(i)._2.sameElements(s1(j)._2), "seeds must be distinct vectors")
  }

  test("decayed counts: decayed <= n, and > 0") {
    val rows = Registry.queries("x11_decayed_counts")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1); val dec = r.getDouble(2)
      assert(dec > 0.0 && dec <= n.toDouble + 1e-9,
        s"decayed weight must be in (0, n]: $r")
    }
  }

  test("dataset card: counts are consistent with the corpus") {
    val r = Registry.queries("p11_dataset_card")(spark, sf0001).collect().head
    val nDocs = Tables(spark, sf0001, "documents").count()
    assert(r.getLong(0) == nDocs)
    assert(r.getLong(1) > 0 && r.getLong(2) > 0 && r.getLong(3) > 0)
    assert(r.getLong(4) >= 0 && r.getLong(4) <= nDocs)
    val mq = r.getDouble(5)
    assert(mq > 0.0 && mq <= 1.0, s"mean quality in (0,1]: $mq")
  }

  test("curriculum shards: phases are a permutation of 1..n_shards and " +
    "phase order follows mean quality") {
    val rows = Registry.queries("p10_curriculum_shards")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.map(_._4).sorted.toSeq == (1L to rows.length.toLong),
      "phases must be 1..n")
    val byPhase = rows.sortBy(_._4).map(_._3)
    assert(byPhase.zip(byPhase.tail).forall { case (a, b) => a >= b },
      "phase 1 holds the highest mean quality")
    assert(rows.map(_._2).sum == Tables(spark, sf0001, "documents").count())
  }
}
