package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Property pins for the round-10 changes — invariants the oracle
  * hash-gates can't express (sample-bounded training, repair
  * idempotence, stream ≡ batch encode equality, hash overflow). */
class R10OpsSpec extends SparkSpec {

  private lazy val emb = Tables(spark, sf0001, "embeddings")
    .select(col("vec_id"), col("embedding"))

  test("fitSample is the identity below the target and bounded above it") {
    val n = emb.count()
    // below target: the SAME frame comes back (no filter, no pass)
    assert(VectorQueries.fitSample(emb, n + 1) eq emb)
    // above: a deterministic strict subset, ~target-sized (the hash
    // is uniform mod the prime; allow 2× slack for lumpiness)
    val s1 = VectorQueries.fitSample(emb, 64).collect().map(_.getLong(0)).sorted
    val s2 = VectorQueries.fitSample(emb, 64).collect().map(_.getLong(0)).sorted
    assert(s1.toSeq == s2.toSeq, "sample must be deterministic")
    assert(s1.length > 0 && s1.length < n)
    assert(s1.length <= 128, s"~64 expected, got ${s1.length}")
    val corpus = emb.collect().map(_.getLong(0)).toSet
    assert(s1.forall(corpus), "sample ⊆ corpus")
  }

  test("seed hash is overflow-proof for 64-bit ids (the 1000×-probe regression)") {
    // ids past ~3.5e9 overflowed the unreduced (id · 2654435761) form
    // under ANSI; the mod-prime-first form is value-identical and safe
    val big = spark.range(1).select(
      (lit(Long.MaxValue) - 3L).as("vec_id"),
      typedLit(Seq(1.0f, -1.0f)).as("embedding"))
    // must not throw ARITHMETIC_OVERFLOW
    assert(VectorQueries.fitSample(big, 1L, nHint = 2L).count() <= 1)
  }

  test("sample-bounded kmeansFit on a small frame equals the full-corpus fit") {
    // below 256·k the sample IS the corpus, so round-9 behavior (and
    // every small-fixture spec) is unchanged by construction
    val fitted = VectorQueries.kmeansFit(emb, 4, 2)
    val manual = VectorQueries.kmeansFitFrom(emb,
      VectorQueries.kmeansFit(emb, 4, 0), 2) // 0 iters = seeds only
    assert(fitted.map(_._1) == manual.map(_._1))
    fitted.zip(manual).foreach { case ((_, a), (_, b)) =>
      assert(a.toSeq == b.toSeq, "centers must be bit-identical")
    }
  }

  test("ivf repair is idempotent on a drift-free index and moved ⊆ corpus") {
    val centers = VectorQueries.kmeansFit(emb, 4, 2)
    // new == old: nothing is dirty, nothing moves
    assert(VectorQueries.ivfRepairFrom(emb, centers, centers, 0.0)
      .count() == 0L, "drift-free index must repair to nothing")
    // the gated lifecycle: every emitted row is a corpus vector whose
    // cell actually changed
    val moved = Registry.queries("v41_ivf_repair")(spark, sf0001).collect()
    assert(moved.nonEmpty, "the fixture's refresh moves some vectors")
    val corpus = emb.collect().map(_.getLong(0)).toSet
    moved.foreach { r =>
      assert(corpus(r.getLong(0)), "moved ⊆ corpus")
      assert(r.getLong(1) != r.getLong(2), "emitted rows must move cells")
    }
  }

  test("streaming PQ encode ≡ batch encode on the same slice (v42)") {
    val books = VectorQueries.pqCodebooks(emb, 64)
    val slice = emb.filter(col("vec_id") % 7 === 3)
    val batch = VectorQueries.pqEncode(slice, books, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val streamed = Registry.queries("v42_pq_stream")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("streaming binary encode ≡ batch encode on the same slice (v43)") {
    val batch = VectorQueries.binaryCodes(emb.filter(col("vec_id") % 7 === 3))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val streamed = Registry.queries("v43_binary_stream")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("semantic dedup keep-set is monotone in the cosine threshold") {
    // raising the bar can only dominate FEWER vectors: keep(t_low)
    // ⊆ keep(t_high), and the cell assignment itself is
    // threshold-independent
    def keeps(t: Double) = graft.queries.DedupQueries.semanticDedup(emb, t)
      .filter(col("keep") === 1L).select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    val lo = keeps(0.1); val mid = keeps(0.2); val hi = keeps(0.6)
    assert(lo.subsetOf(mid) && mid.subsetOf(hi),
      s"keeps must grow with the bar: ${lo.size} / ${mid.size} / ${hi.size}")
    assert(lo.nonEmpty, "even a low bar keeps one representative per set")
  }
}
