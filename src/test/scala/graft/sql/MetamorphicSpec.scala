package graft.sql

import org.scalacheck.Gen

import graft.SparkSpec

/** Metamorphic properties of the full dialect pipeline (parse → plan →
  * execute): relations that must hold between RELATED queries for any
  * generated predicate, catching planner bugs (filter mistranslation,
  * two-valued-not drift, limit/order interaction) that example-based
  * gates can't enumerate. Runs on the 150-row customer fixture —
  * numeric, text, and null-free key columns. */
class MetamorphicSpec extends SparkSpec {

  private lazy val g = GraftSession(spark, sf0001)
  private lazy val total = g.sql("select c_custkey from customer").count()

  private def rows(where: String): Long =
    g.sql(s"select c_custkey from customer where $where").count()

  // predicate grammar over customer: numeric compares, like, in,
  // between, and/or/not combinations
  private val atom: Gen[String] = Gen.oneOf(
    Gen.choose(1L, 200L).map(k => s"c_custkey < $k"),
    Gen.choose(1L, 200L).map(k => s"c_custkey >= $k"),
    Gen.choose(0L, 24L).map(n => s"c_nationkey = $n"),
    Gen.choose(0L, 9999L).map(a => s"c_acctbal > $a"),
    Gen.oneOf("c_name like 'Customer%1'", "c_name like '%5'",
      "c_mktsegment = 'BUILDING'", "c_custkey in (1, 3, 5, 7, 11)",
      "c_custkey between 10 and 50"))

  private val pred: Gen[String] = for {
    a <- atom; b <- atom
    form <- Gen.oneOf(0, 1, 2, 3)
  } yield form match {
    case 0 => a
    case 1 => s"$a and $b"
    case 2 => s"$a or $b"
    case 3 => s"not ($a)"
  }

  // FIXED seed: failures replay exactly (an unseeded sample loop makes
  // a real planner bug look like flake — no seed to report, different
  // predicates every CI run)
  private def samples[A](gen: Gen[A], n: Int): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.iterate(org.scalacheck.rng.Seed(42L))(_.next)
      .map(seed => gen.apply(params, seed))
      .flatten.take(n).toSeq
  }

  test("conjunction can only shrink the row set; disjunction only grow it") {
    samples(Gen.zip(pred, atom), 12).foreach { case (p, q) =>
      val rp = rows(p)
      assert(rows(s"($p) and $q") <= rp, s"AND grew rows: ($p) and $q")
      assert(rows(s"($p) or $q") >= rp, s"OR shrank rows: ($p) or $q")
    }
  }

  test("two-valued not: p and not p partition the (null-free) table") {
    samples(pred, 12).foreach { p =>
      val (rp, rn) = (rows(p), rows(s"not ($p)"))
      assert(rp + rn == total, s"p=$p: $rp + $rn != $total")
    }
  }

  test("top N caps at N and never changes which predicate rows exist") {
    samples(Gen.zip(pred, Gen.choose(1, 20)), 8).foreach { case (p, n) =>
      val rp = rows(p)
      val topped = g.sql(
        s"select top $n c_custkey from customer where $p").count()
      assert(topped == math.min(n.toLong, rp), s"top $n where $p")
    }
  }

  test("session() is monotone in gap and bounded by events per user") {
    // metamorphic relations on the events fixture: a larger silence
    // threshold can only merge sessions, never split them, so per-user
    // session counts are antitone in gap; and 1 ≤ sessions ≤ events.
    def sessions(gap: String): Map[Long, (Long, Long)] =
      g.sql(s"""select user_id, max(session(ts, '$gap', user_id)) as ns,
               |count(event_id) as ne from events group by user_id""".stripMargin)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2).toLong))
        .toMap
    val narrow = sessions("10 minutes")
    val wide = sessions("2 hours")
    assert(narrow.keySet == wide.keySet)
    narrow.foreach { case (u, (nsN, ne)) =>
      val (nsW, _) = wide(u)
      assert(nsW <= nsN, s"user $u: widening the gap split sessions ($nsN -> $nsW)")
      assert(nsN >= 1L && nsN <= ne, s"user $u: $nsN sessions outside [1, $ne]")
    }
    assert(narrow.exists { case (u, (ns, _)) => ns > wide(u)._1 },
      "10m vs 2h should differ for at least one user on this fixture")
  }

  test("dedup near threshold is antitone: higher t keeps a subset of pairs") {
    def pairsAt(t: Double): Set[(Long, Long)] =
      g.sql(s"dedup near doc_id, text from documents threshold $t")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val candidates = g.sql("dedup near doc_id, text from documents")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lo = pairsAt(0.2)
    val mid = pairsAt(0.5)
    val hi = pairsAt(0.9)
    assert(lo.subsetOf(candidates), "verified pairs must come from the candidates")
    assert(mid.subsetOf(lo), "raising the threshold must only drop pairs")
    assert(hi.subsetOf(mid), "raising the threshold must only drop pairs")
    assert(lo.nonEmpty, "fixture should have near-dups at jac >= 0.2")
  }

  test("similar top k is monotone: top-3 neighbor pairs ⊆ top-5 pairs") {
    def pairsAt(k: Int): Set[(Long, Long)] =
      g.sql(s"similar vec_id, embedding from embeddings top $k")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p3 = pairsAt(3)
    val p5 = pairsAt(5)
    assert(p3.nonEmpty, "fixture buckets should produce candidates")
    assert(p3.subsetOf(p5), "shrinking k must only drop neighbors")
  }

  test("order by never changes the row count; distinct never exceeds it") {
    samples(pred, 8).foreach { p =>
      val rp = rows(p)
      val ordered = g.sql(
        s"select c_custkey from customer where $p order by c_acctbal").count()
      assert(ordered == rp, s"order by changed count for $p")
      val dist = g.sql(
        s"select distinct c_nationkey from customer where $p").count()
      // strict: zero matched rows MUST give zero distinct rows (an
      // empty-input distinct emitting a row is exactly the planner
      // bug this property exists to catch)
      assert(dist <= rp, s"distinct exceeded rows for $p")
    }
  }
}
