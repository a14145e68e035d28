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

  test("rerank depth sweep (v34): deeper shortlists never lose recall") {
    val rows = Registry.queries("v34_rerank_depth_sweep")(spark, sf0001)
      .groupBy(col("depth"))
      .agg(sum(col("hits")).as("hits"), sum(col("k")).as("k"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1).toDouble / r.getLong(2))
      .toMap
    // the depth-d shortlist is a prefix of the depth-d' shortlist for
    // d < d' (same Hamming ranking), so recall is non-decreasing
    assert(rows(5L) <= rows(10L) && rows(10L) <= rows(20L),
      s"recall must be monotone in depth: $rows")
    // 1-bit codes on the 60-vector sf0.001 corpus measure 0.48 at
    // depth 20 — the floor guards against collapse (a broken code or
    // ranking lands near k/corpus ≈ 0.08), not against quantization
    // loss, which the sweep exists to measure
    assert(rows(20L) >= 0.3, s"depth-20 recall collapsed: ${rows(20L)}")
  }

  test("retention cohorts (e24): week_idx 0 row equals cohort size") {
    val df = Registry.queries("e24_retention_cohorts")(spark, sf0001).cache()
    try {
      // every user is active in their own first week, so the
      // week_idx=0 row of each cohort counts the whole cohort, and
      // every other row can only be <= it; indices are never negative
      assert(df.filter(col("week_idx") < 0).isEmpty)
      val w0 = df.filter(col("week_idx") === 0)
        .select(col("cohort"), col("n_active").as("size"))
      val bad = df.join(w0, "cohort")
        .filter(col("n_active") > col("size"))
      assert(bad.isEmpty, "a later week outgrew its cohort")
      // cohort sizes sum to the distinct-user count (partition proof)
      val users = Tables(spark, sf0001, "events")
        .select(col("user_id")).distinct().count()
      val total = w0.agg(sum(col("size"))).collect()(0).getLong(0)
      assert(total == users, s"cohorts sum $total != users $users")
    } finally df.unpersist()
  }

  test("filtered search (v36): every neighbor satisfies the predicate, k stays filled") {
    val out = Registry.queries("v36_filtered_rerank")(spark, sf0001)
    val labels = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id").as("n_id"), col("label"))
    // pre-filtering the corpus guarantees both properties at once;
    // post-filtering a top-k would break the second on selective preds
    assert(out.join(labels, "n_id").filter(col("label") =!= 1).isEmpty,
      "a neighbor escaped the label predicate")
    val counts = out.groupBy(col("q_id")).count().collect()
    assert(counts.length == 5 && counts.forall(_.getLong(1) == 5L),
      "each query must return exactly k=5 filtered neighbors")
  }

  test("hard negatives (v37): every mined pair crosses labels, k stays filled") {
    val out = Registry.queries("v37_hard_negatives")(spark, sf0001)
    val labels = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("label"))
    val joined = out
      .join(labels.select(col("vec_id").as("n_id"), col("label").as("n_label")), "n_id")
      .join(labels.select(col("vec_id").as("q_id"), col("label").as("q_label")), "q_id")
    assert(joined.filter(col("n_label") === col("q_label")).isEmpty,
      "a same-label pair leaked into the negatives")
    val counts = out.groupBy(col("q_id")).count().collect()
    assert(counts.length == 5 && counts.forall(_.getLong(1) == 5L))
  }

  test("quality calibration (t42): every source keeps at least its top 70%") {
    val out = Registry.queries("t42_source_quality_calibration")(spark, sf0001)
    val frac = out.groupBy(col("source"))
      .agg((sum(col("keep")).cast("double") / count(lit(1))).as("f"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // keep = pctile >= 0.3 cuts at a BUCKET boundary, so each source
    // retains >= 70% (bucket granularity can only round the cut up)
    frac.foreach { case (src, f) =>
      assert(f >= 0.7, s"$src keeps only $f")
      assert(f <= 1.0)
    }
    // and the cut actually bites somewhere (not a degenerate keep-all)
    assert(frac.values.exists(_ < 1.0), "threshold never engaged")
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

  test("centroid outliers (v39): dist is the true min over all centers, sorted desc") {
    val centers = VectorQueries.kmeansFit(emb, VectorQueries.KMEANS_K,
      VectorQueries.KMEANS_ITERS - 1)
    val out = Registry.queries("v39_centroid_outliers")(spark, sf0001).collect()
    assert(out.length == 20)
    val dists = out.map(_.getDouble(2))
    assert(dists.zip(dists.tail).forall { case (a, b) => a >= b },
      "outliers must arrive farthest-first")
    // recompute the min-over-centers distance for each returned row
    val byId = Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    out.foreach { r =>
      val v = byId(r.getLong(0))
      val best = centers.map { case (_, c) =>
        v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum }.min
      assert(math.abs(best - r.getDouble(2)) < 1e-9,
        s"dist must be the min over all centers for vec ${r.getLong(0)}")
    }
  }

  test("embedding drift (x14): self-drift is exactly zero, parity halves gate-shaped") {
    val self = ApproxQueries.embeddingDrift(
      emb.select(col("embedding")), emb.select(col("embedding"))).collect()
    assert(self.length == ApproxQueries.DriftDims)
    self.foreach { r =>
      assert(r.getDouble(1) == 0.0, s"self-PSI must be 0, got ${r.getDouble(1)}")
      assert(!r.getBoolean(2))
    }
    val gate = Registry.queries("x14_embedding_drift")(spark, sf0001).collect()
    assert(gate.map(_.getLong(0)).sorted.toSeq ==
      (0L until ApproxQueries.DriftDims.toLong).toSeq)
    gate.foreach(r => assert(r.getDouble(1) >= 0.0,
      "PSI is a sum of (p-q)ln(p/q) terms, each nonnegative"))
  }

  test("snapshot diff (d20): statuses partition both sides' fingerprint sets") {
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
    def fps(df: org.apache.spark.sql.DataFrame): Long =
      df.select(graft.functions.TextFunctions.docFingerprint(col("text")))
        .distinct().count()
    val oldFps = fps(docs.filter(col("doc_id") % 3 =!= 0))
    val newFps = fps(docs.filter(col("doc_id") % 3 =!= 1))
    val diff = Registry.queries("d20_snapshot_diff")(spark, sf0001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def n(s: String) = diff.getOrElse(s, 0L)
    assert(n("retained") + n("removed") == oldFps,
      "retained+removed must partition the old snapshot's fingerprints")
    assert(n("retained") + n("added") == newFps,
      "retained+added must partition the new snapshot's fingerprints")
    assert(n("retained") > 0, "the %3 thirds overlap by construction")
  }

  test("epoch plan (p14): weights sum to 1, caps hold, budget never exceeded") {
    val budget = 1000000.0
    val plan = Registry.queries("p14_epoch_plan")(spark, sf0001).collect()
    assert(plan.nonEmpty)
    // wtot is Det-decimal-rounded (1e-6 quantum), so the share sum
    // sits within quantum/wtot of 1 — not within double-ulp of it
    val wsum = plan.map(_.getDouble(2)).sum
    assert(math.abs(wsum - 1.0) < 1e-6, s"weights must sum to 1, got $wsum")
    plan.foreach { r =>
      val (tok, epochs, eff) = (r.getLong(1), r.getDouble(3), r.getDouble(4))
      assert(epochs > 0.0 && epochs <= PipelineQueries.MaxEpochs)
      assert(math.abs(eff - epochs * tok) < 1e-6)
    }
    assert(plan.map(_.getDouble(4)).sum <= budget + 1e-6,
      "capped plans can only come in UNDER budget")
  }

  test("token fertility (t44): volumes reconcile with t01, fertility >= 1") {
    val t01 = Registry.queries("t01_token_stats")(spark, sf0001)
      .agg(sum(col("n_tok")), sum(col("n_subword"))).collect().head
    val fert = Registry.queries("t44_token_fertility")(spark, sf0001).collect()
    assert(fert.map(_.getLong(2)).sum == t01.getLong(0),
      "per-language words must sum to the corpus t01 total")
    assert(fert.map(_.getLong(3)).sum == t01.getLong(1),
      "per-language subwords must sum to the corpus t01 total")
    fert.foreach { r =>
      assert(r.getDouble(4) >= 1.0,
        s"every token is at least one subword piece (${r.getString(0)})")
      assert(r.getDouble(5) > 0.0)
    }
  }

  test("pack efficiency (t45): bins = ceil(total/size), fill in (0,1], bins antitone") {
    val tot = Registry.queries("t01_token_stats")(spark, sf0001)
      .agg(sum(col("n_tok"))).collect().head.getLong(0)
    val rows = Registry.queries("t45_pack_efficiency")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(256L, 512L, 1024L))
    rows.foreach { case (size, bins, span, fill) =>
      assert(bins == (tot + size - 1) / size,
        s"contiguous packing fills bins exactly: size=$size")
      assert(fill > 0.0 && fill <= 1.0)
      assert(span >= 0 && span <= bins,
        "a straddler count can't exceed the boundary count")
    }
    assert(rows.map(_._2).toSeq == rows.map(_._2).toSeq.sorted.reverse,
      "doubling the context can only shrink the bin count")
  }

  test("nprobe sweep (v40): recall is monotone in nprobe, per-query and total") {
    val rows = Registry.queries("v40_nprobe_sweep")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byProbe = rows.groupBy(_._1)
    assert(byProbe.keySet == Set(1L, 2L, 3L))
    // per-query: probing MORE cells can only add candidates, so hits
    // at nprobe p+1 dominate hits at p for every query
    val hitsAt = byProbe.map { case (np, rs) =>
      np -> rs.map(r => r._2 -> r._3).toMap }
    Seq((1L, 2L), (2L, 3L)).foreach { case (lo, hi) =>
      hitsAt(lo).foreach { case (q, h) =>
        assert(hitsAt(hi)(q) >= h,
          s"query $q lost recall going from nprobe=$lo to $hi")
      }
    }
    rows.foreach { case (_, _, hits, kk) => assert(hits >= 0 && hits <= kk) }
  }

  test("quality drift (t46): self-drift is zero, parity gate covers every source") {
    val d = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val self = TextQueries.qualityDrift(d, d).collect()
    self.foreach { r =>
      assert(r.getDouble(1) == 0.0 && !r.getBoolean(2),
        s"${r.getString(0)}: a snapshot can't drift from itself")
    }
    val gate = Registry.queries("t46_quality_drift")(spark, sf0001).collect()
    val allSources = d.select(col("source")).distinct().count()
    assert(gate.length == allSources,
      "every source must get a drift verdict, including one-sided ones")
    gate.foreach(r => assert(r.getDouble(1) >= 0.0))
  }
}
