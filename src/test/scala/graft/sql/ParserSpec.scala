package graft.sql

import org.scalatest.funsuite.AnyFunSuite
import Ast._

class ParserSpec extends AnyFunSuite {

  test("select list with aliases, both syntaxes") {
    val q = Parser.parse("select a, b as bee, cee = c + 1 from t")
    assert(q.items.size == 3)
    assert(q.items(1).alias.contains("bee"))
    assert(q.items(2).alias.contains("cee"))
  }

  test("select * and empty select are select-all") {
    assert(Parser.parse("select * from t").star)
    assert(Parser.parse("select from t").items.isEmpty)
  }

  test("top and limit both set the row cap") {
    assert(Parser.parse("select top 5 a from t").limit.contains(5L))
    assert(Parser.parse("select a from t limit 7").limit.contains(7L))
  }

  test("order by is descending by default, asc opt-in") {
    assert(!Parser.parse("select a from t order by a").orderAsc)
    assert(Parser.parse("select a from t order by a asc").orderAsc)
  }

  test("distinct with and without hidden") {
    val q1 = Parser.parse("select distinct a, b from t")
    assert(q1.distinct.exists(!_.hidden))
    val q2 = Parser.parse("select distinct hidden a, b from t")
    assert(q2.distinct.exists(_.hidden))
  }

  test("join chain with aliases and size hints") {
    val q = Parser.parse(
      "select a from t1 x inner join t2 y on x.k = y.k left sjoin t3 z on y.j = z.j")
    assert(q.from.joins.size == 2)
    assert(q.from.joins(0).joinType == InnerJoin)
    assert(q.from.joins(1).joinType == LeftJoin)
    assert(q.from.joins(1).sizeHint.contains("sjoin"))
  }

  test("outer alone means left join") {
    val q = Parser.parse("select a from t1 x outer join t2 y on x.k = y.k")
    assert(q.from.joins.head.joinType == LeftJoin)
  }

  test("join without alias is an error") {
    assertThrows[Exception](Parser.parse("select a from t1 x join t2 on x.k = t2.k"))
  }

  test("predicates: and/or/xor/not, like, in, between") {
    val q = Parser.parse(
      "select a from t where not (a > 1 and b like 'x%') or c in (1,2) xor d between 3 and 4")
    assert(q.where.isDefined)
  }

  test("case searched and simple") {
    val q = Parser.parse(
      "select case when a > 1 then 'hi' else 'lo' end, case b when 1 then 'one' end from t")
    assert(q.items.head.expr.isInstanceOf[CaseSearched])
    assert(q.items(1).expr.isInstanceOf[CaseSimple])
  }

  test("count(*) becomes count of literal 1") {
    val q = Parser.parse("select count(*) from t")
    assert(q.items.head.expr == AggCall("count", Lit("1", quoted = false), distinct = false))
  }

  test("aggregate distinct") {
    val q = Parser.parse("select count(distinct a) from t")
    assert(q.items.head.expr == AggCall("count", ColRef(None, "a"), distinct = true))
  }

  test("arithmetic precedence: add < mult group; ^ in mult group, left-assoc") {
    // the dialect puts * / % ^ at one precedence level
    // (reference parser.go:300-357): 1 + 2*3^2 = 1 + ((2*3)^2)
    val q = Parser.parse("select 1 + 2 * 3 ^ 2 from t")
    val e = q.items.head.expr
    e match {
      case Arith(Add, _, Arith(Pow, Arith(Mul, _, _), _)) => ()
      case other => fail(s"wrong precedence: $other")
    }
  }

  test("dotted file names survive as table refs") {
    val q = Parser.parse("select a from sample.csv nh")
    assert(q.from.table == "sample.csv")
    assert(q.from.noHeader)
  }

  test("multi-statement split respects quotes") {
    val stmts = Parser.splitStatements("select 'a;b' from t; select c from u;")
    assert(stmts.size == 2)
    assert(stmts.head.contains("'a;b'"))
  }

  test("comma-optional select list") {
    val q = Parser.parse("select a b c from t")
    assert(q.items.size == 3)
  }

  test("dedup statement grammar: near/exact, comma optional, single table") {
    val d = Parser.parseStmt("dedup near doc_id, text from documents")
      .asInstanceOf[Ast.DedupStmt]
    assert(d.near && d.idCol == "doc_id" && d.textCol == "text")
    assert(d.from.table == "documents")
    val e = Parser.parseStmt("dedup exact id body from t")
      .asInstanceOf[Ast.DedupStmt]
    assert(!e.near && e.idCol == "id" && e.textCol == "body")
    // threshold clause: near-only, numeric, in [0, 1]
    val t = Parser.parseStmt("dedup near a b from t threshold 0.7")
      .asInstanceOf[Ast.DedupStmt]
    assert(t.threshold.contains(0.7))
    assert(d.threshold.isEmpty)
    val b = Parser.parseStmt("dedup best doc_id, text from documents")
      .asInstanceOf[Ast.DedupStmt]
    assert(b.mode == "best" && !b.near)
    assertThrows[Exception](
      Parser.parseStmt("dedup best a, b from t threshold 0.7"))
    assertThrows[Exception](
      Parser.parseStmt("dedup exact a, b from t threshold 0.7"))
    assertThrows[Exception](
      Parser.parseStmt("dedup near a, b from t threshold 1.5"))
    assertThrows[Exception](
      Parser.parseStmt("dedup near a, b from t threshold x"))
    // mode is mandatory
    assertThrows[Exception](Parser.parseStmt("dedup doc_id, text from t"))
    // joins rejected
    assertThrows[Exception](
      Parser.parseStmt("dedup near a, b from t x join u y on x.k = y.k"))
    // trailing garbage rejected
    assertThrows[Exception](
      Parser.parseStmt("dedup near a, b from t where a > 1"))
  }

  test("similar statement grammar: columns, optional top k") {
    val s = Parser.parseStmt("similar vec_id, embedding from embeddings top 3")
      .asInstanceOf[Ast.SimilarStmt]
    assert(s.idCol == "vec_id" && s.vecCol == "embedding" && s.k == 3L)
    assert(s.from.table == "embeddings")
    val d = Parser.parseStmt("similar id v from t").asInstanceOf[Ast.SimilarStmt]
    assert(d.k == 5L, "k defaults to 5")
    assertThrows[Exception](Parser.parseStmt("similar id v from t top 0"))
    assertThrows[Exception](Parser.parseStmt("similar id from t"))
    assertThrows[Exception](Parser.parseStmt("similar id v from t extra"))
  }

  test("search statement grammar: terms split/lowercased/deduped, optional top k") {
    val s = Parser.parseStmt("search doc_id, text from documents for 'Spark WINDOW join spark' top 10")
      .asInstanceOf[Ast.SearchStmt]
    assert(s.idCol == "doc_id" && s.textCol == "text" && s.k == 10L)
    assert(s.terms == Seq("spark", "window", "join"),
      "terms must be lowercased, whitespace-split, order-preserving deduped")
    val d = Parser.parseStmt("search id body from t for 'x'")
      .asInstanceOf[Ast.SearchStmt]
    assert(d.k == 20L, "k defaults to 20")
    assertThrows[Exception](Parser.parseStmt("search id body from t for ''"))
    assertThrows[Exception](Parser.parseStmt("search id body from t for '  '"))
    assertThrows[Exception](Parser.parseStmt("search id body from t"))
    assertThrows[Exception](Parser.parseStmt("search id body from t for terms"))
    assertThrows[Exception](Parser.parseStmt("search id body from t for 'x' top 0"))
    assertThrows[Exception](Parser.parseStmt("search id body from t for 'x' extra"))
  }

  test("split statement grammar: three positive percentages summing to 100") {
    val s = Parser.parseStmt("split doc_id from documents into 90 5 5")
      .asInstanceOf[Ast.SplitStmt]
    assert(s.idCol == "doc_id" && s.pcts == Seq(90L, 5L, 5L))
    val c = Parser.parseStmt("split id from t into 70, 20, 10")
      .asInstanceOf[Ast.SplitStmt]
    assert(c.pcts == Seq(70L, 20L, 10L), "commas optional between percentages")
    val d = Parser.parseStmt("split id from t").asInstanceOf[Ast.SplitStmt]
    assert(d.pcts == Seq(80L, 10L, 10L), "defaults to 80/10/10")
    assertThrows[Exception](Parser.parseStmt("split id from t into 90 10"))
    assertThrows[Exception](Parser.parseStmt("split id from t into 50 30 30"))
    assertThrows[Exception](Parser.parseStmt("split id from t into 100 0 0"))
    assertThrows[Exception](Parser.parseStmt("split id from t into 90 5 5 extra"))
  }

  test("cluster statement grammar: columns, optional into k in [2, 256]") {
    val s = Parser.parseStmt("cluster vec_id, embedding from embeddings into 8")
      .asInstanceOf[Ast.ClusterStmt]
    assert(s.idCol == "vec_id" && s.vecCol == "embedding" && s.k == 8L)
    val d = Parser.parseStmt("cluster id v from t").asInstanceOf[Ast.ClusterStmt]
    assert(d.k == 4L, "k defaults to 4")
    assertThrows[Exception](Parser.parseStmt("cluster id v from t into 1"))
    assertThrows[Exception](Parser.parseStmt("cluster id v from t into 1000"))
    assertThrows[Exception](Parser.parseStmt("cluster id from t"))
    assertThrows[Exception](Parser.parseStmt("cluster id v from t extra"))
  }

  test("chunk statement grammar: optional size/overlap with bounds") {
    val c = Parser.parseStmt("chunk doc_id, text from documents size 32 overlap 8")
      .asInstanceOf[Ast.ChunkStmt]
    assert(c.idCol == "doc_id" && c.textCol == "text")
    assert(c.size == 32L && c.overlap == 8L)
    val d = Parser.parseStmt("chunk id body from t").asInstanceOf[Ast.ChunkStmt]
    assert(d.size == 64L && d.overlap == 16L, "defaults to 64/16")
    assertThrows[Exception](Parser.parseStmt("chunk id body from t size 0"))
    assertThrows[Exception](Parser.parseStmt("chunk id body from t size 8 overlap 8"))
    assertThrows[Exception](Parser.parseStmt("chunk id body from t size 8"))
    assertThrows[Exception](Parser.parseStmt("chunk id from t"))
    assertThrows[Exception](Parser.parseStmt("chunk id body from t extra"))
  }

  test("sample statement grammar: optional pct in [1, 99]") {
    val s = Parser.parseStmt("sample doc_id from documents pct 25")
      .asInstanceOf[Ast.SampleStmt]
    assert(s.idCol == "doc_id" && s.pct == 25L)
    val d = Parser.parseStmt("sample id from t").asInstanceOf[Ast.SampleStmt]
    assert(d.pct == 10L, "pct defaults to 10")
    assertThrows[Exception](Parser.parseStmt("sample id from t pct 0"))
    assertThrows[Exception](Parser.parseStmt("sample id from t pct 100"))
    assertThrows[Exception](Parser.parseStmt("sample id from t extra"))
  }

  test("weighted sample grammar: top n by w") {
    val s = Parser.parseStmt("sample doc_id from documents top 50 by n_chars")
      .asInstanceOf[Ast.SampleStmt]
    assert(s.idCol == "doc_id" && s.topN.contains(50L) &&
      s.weightCol.contains("n_chars"))
    assertThrows[Exception](Parser.parseStmt("sample id from t top 0 by w"))
    assertThrows[Exception](Parser.parseStmt("sample id from t top 5"))
    assertThrows[Exception](Parser.parseStmt("sample id from t top 5 by w extra"))
    val p = Parser.parseStmt("sample id from t top 5 by w per src")
      .asInstanceOf[Ast.SampleStmt]
    assert(p.perCol.contains("src"))
    assertThrows[Exception](Parser.parseStmt("sample id from t top 5 by w per"))
  }

  test("trend statement grammar: optional top") {
    val t = Parser.parseStmt("trend ts, event_type from events top 5")
      .asInstanceOf[Ast.TrendStmt]
    assert(t.tsCol == "ts" && t.keyCol == "event_type" && t.k == 5L)
    val d = Parser.parseStmt("trend ts kind from ev").asInstanceOf[Ast.TrendStmt]
    assert(d.k == 3L, "top defaults to 3")
    assertThrows[Exception](Parser.parseStmt("trend ts from ev"))
    assertThrows[Exception](Parser.parseStmt("trend ts, kind from ev top 0"))
    assertThrows[Exception](Parser.parseStmt("trend ts, kind from ev extra"))
  }

  test("card statement grammar") {
    val c = Parser.parseStmt("card doc_id, text from documents")
      .asInstanceOf[Ast.CardStmt]
    assert(c.idCol == "doc_id" && c.textCol == "text")
    assertThrows[Exception](Parser.parseStmt("card doc_id from documents"))
    assertThrows[Exception](Parser.parseStmt("card id, text from t extra"))
  }

  test("calibrate statement grammar") {
    val c = Parser.parseStmt("calibrate doc_id, source, text from documents")
      .asInstanceOf[Ast.CalibrateStmt]
    assert(c.idCol == "doc_id" && c.srcCol == "source" && c.textCol == "text")
    // commas optional, dialect-wide
    val d = Parser.parseStmt("calibrate id src body from t")
      .asInstanceOf[Ast.CalibrateStmt]
    assert(d.idCol == "id" && d.srcCol == "src" && d.textCol == "body")
    assertThrows[Exception](Parser.parseStmt("calibrate doc_id, text from documents"))
    assertThrows[Exception](Parser.parseStmt("calibrate a, a, text from t"))
    assertThrows[Exception](Parser.parseStmt("calibrate a, b, c from t extra"))
  }

  test("negatives statement grammar") {
    val n = Parser.parseStmt("negatives vec_id, embedding, label from embeddings top 10")
      .asInstanceOf[Ast.NegativesStmt]
    assert(n.idCol == "vec_id" && n.vecCol == "embedding" &&
      n.labelCol == "label" && n.k == 10L)
    val d = Parser.parseStmt("negatives id vec lab from t")
      .asInstanceOf[Ast.NegativesStmt]
    assert(d.k == 5L, "top defaults to 5")
    assertThrows[Exception](Parser.parseStmt("negatives id, vec from t"))
    assertThrows[Exception](Parser.parseStmt("negatives id, id, lab from t"))
    assertThrows[Exception](Parser.parseStmt("negatives id, vec, lab from t top 0"))
    assertThrows[Exception](Parser.parseStmt("negatives id, vec, lab from t extra"))
  }

  test("outliers statement grammar") {
    val o = Parser.parseStmt("outliers vec_id, embedding from embeddings top 10")
      .asInstanceOf[Ast.OutliersStmt]
    assert(o.idCol == "vec_id" && o.vecCol == "embedding" && o.k == 10L)
    val d = Parser.parseStmt("outliers id vec from t")
      .asInstanceOf[Ast.OutliersStmt]
    assert(d.k == 20L, "top defaults to 20")
    assertThrows[Exception](Parser.parseStmt("outliers id from t"))
    assertThrows[Exception](Parser.parseStmt("outliers id, id from t"))
    assertThrows[Exception](Parser.parseStmt("outliers id, vec from t top 0"))
    assertThrows[Exception](Parser.parseStmt("outliers id, vec from t extra"))
  }

  test("dedup semantic mode grammar") {
    val d = Parser.parseStmt("dedup semantic vec_id, embedding from embeddings")
      .asInstanceOf[Ast.DedupStmt]
    assert(d.mode == "semantic" && d.threshold.isEmpty)
    val t = Parser.parseStmt(
      "dedup semantic id vec from t threshold 0.4").asInstanceOf[Ast.DedupStmt]
    assert(t.threshold.contains(0.4))
    // threshold still rejected on the modes it doesn't apply to
    assertThrows[Exception](
      Parser.parseStmt("dedup exact id, t from x threshold 0.4"))
  }

  test("repair statement grammar") {
    val r = Parser.parseStmt("repair vec_id, embedding from embeddings")
      .asInstanceOf[Ast.RepairStmt]
    assert(r.idCol == "vec_id" && r.vecCol == "embedding" &&
      r.thresh == graft.queries.VectorQueries.IVF_REPAIR_THRESH)
    val t = Parser.parseStmt("repair id vec from t threshold 0.5")
      .asInstanceOf[Ast.RepairStmt]
    assert(t.thresh == 0.5)
    assertThrows[Exception](Parser.parseStmt("repair id from t"))
    assertThrows[Exception](Parser.parseStmt("repair id, id from t"))
    assertThrows[Exception](Parser.parseStmt("repair id, vec from t threshold 0"))
    assertThrows[Exception](Parser.parseStmt("repair id, vec from t extra"))
    // using '<path>' pins the persisted-index form; path must be quoted
    val u = Parser.parseStmt("repair id, vec from t using '/tmp/i' threshold 0.5")
      .asInstanceOf[Ast.RepairStmt]
    assert(u.indexPath.contains("/tmp/i") && u.thresh == 0.5)
    assert(Parser.parseStmt("repair id, vec from t")
      .asInstanceOf[Ast.RepairStmt].indexPath.isEmpty)
    assertThrows[Exception](Parser.parseStmt("repair id, vec from t using /tmp/i"))
    assertThrows[Exception](Parser.parseStmt("repair id, vec from t using ''"))
  }

  test("index statement grammar") {
    val i = Parser.parseStmt("index vec_id, embedding from embeddings into '/tmp/idx'")
      .asInstanceOf[Ast.IndexStmt]
    assert(i.idCol == "vec_id" && i.vecCol == "embedding" &&
      i.from.table == "embeddings" && i.path == "/tmp/idx")
    // comma optional, like every two-column statement
    assert(Parser.parseStmt("index id vec from t into '/x'")
      .asInstanceOf[Ast.IndexStmt].path == "/x")
    assertThrows[Exception](Parser.parseStmt("index id, vec from t")) // no into
    assertThrows[Exception](Parser.parseStmt("index id, vec from t into /x")) // unquoted
    assertThrows[Exception](Parser.parseStmt("index id, vec from t into ''"))
    assertThrows[Exception](Parser.parseStmt("index id, id from t into '/x'"))
    assertThrows[Exception](Parser.parseStmt("index id, vec from t into '/x' extra"))
  }

  test("ingest and compact statement grammar") {
    val i = Parser.parseStmt("ingest vec_id, embedding from arrivals into '/tmp/idx'")
      .asInstanceOf[Ast.IngestStmt]
    assert(i.idCol == "vec_id" && i.vecCol == "embedding" &&
      i.from.table == "arrivals" && i.path == "/tmp/idx" && !i.append)
    assert(Parser.parseStmt("ingest id vec from '/tmp/a.parquet' into '/x' append")
      .asInstanceOf[Ast.IngestStmt].append)
    assertThrows[Exception](Parser.parseStmt("ingest id, id from t into '/x'"))
    assertThrows[Exception](Parser.parseStmt("ingest id, vec from t into idx")) // unquoted
    assertThrows[Exception](Parser.parseStmt("ingest id, vec from t into '/x' extra"))
    val c = Parser.parseStmt("compact '/tmp/idx'").asInstanceOf[Ast.CompactStmt]
    assert(c.path == "/tmp/idx" && c.files == 4L)
    assert(Parser.parseStmt("compact '/x' files 2")
      .asInstanceOf[Ast.CompactStmt].files == 2L)
    assertThrows[Exception](Parser.parseStmt("compact idx")) // unquoted
    assertThrows[Exception](Parser.parseStmt("compact '/x' files 0"))
  }

  test("serve statement grammar") {
    val s = Parser.parseStmt("serve vec_id, embedding from '/tmp/idx'")
      .asInstanceOf[Ast.ServeStmt]
    assert(s.idCol == "vec_id" && s.vecCol == "embedding" &&
      s.path == "/tmp/idx" && s.k == 5L)
    assert(Parser.parseStmt("serve id vec from '/x' top 20")
      .asInstanceOf[Ast.ServeStmt].k == 20L)
    // external batch: registered table name or a quoted path
    val q = Parser.parseStmt("serve id, vec from '/x' query '/tmp/batch.parquet' top 3")
      .asInstanceOf[Ast.ServeStmt]
    assert(q.query.contains("/tmp/batch.parquet") && q.k == 3L)
    assert(Parser.parseStmt("serve id, vec from '/x' query arrivals")
      .asInstanceOf[Ast.ServeStmt].query.contains("arrivals"))
    assert(Parser.parseStmt("serve id, vec from '/x'")
      .asInstanceOf[Ast.ServeStmt].query.isEmpty)
    // multi-probe: query batches only, 1..8
    val pr = Parser.parseStmt("serve id, vec from '/x' query b top 5 probe 2")
      .asInstanceOf[Ast.ServeStmt]
    assert(pr.probe == 2L && pr.k == 5L)
    assert(Parser.parseStmt("serve id, vec from '/x' query b")
      .asInstanceOf[Ast.ServeStmt].probe == 1L)
    assertThrows[Exception](Parser.parseStmt("serve id, vec from '/x' probe 2")) // no query
    assertThrows[Exception](Parser.parseStmt("serve id, vec from '/x' query b probe 0"))
    assertThrows[Exception](Parser.parseStmt("serve id, vec from '/x' query b probe 9"))
    // pq serving: query batches only, shortlist ≥ k
    val pq = Parser.parseStmt("serve id, vec from '/x' query b top 5 pq shortlist 30")
      .asInstanceOf[Ast.ServeStmt]
    assert(pq.pq && pq.shortlist == 30L && pq.k == 5L)
    assert(Parser.parseStmt("serve id, vec from '/x' query b pq")
      .asInstanceOf[Ast.ServeStmt].shortlist == 20L)
    assert(Parser.parseStmt("index id, vec from t into '/x' pq")
      .asInstanceOf[Ast.IndexStmt].pq)
    assert(!Parser.parseStmt("index id, vec from t into '/x'")
      .asInstanceOf[Ast.IndexStmt].pq)
    assertThrows[Exception](Parser.parseStmt("serve id, vec from '/x' pq")) // no query
    assertThrows[Exception](Parser.parseStmt("serve id, vec from '/x' query b shortlist 50")) // no pq
    assertThrows[Exception](Parser.parseStmt("serve id, vec from '/x' query b top 30 pq shortlist 10"))
    assertThrows[Exception](Parser.parseStmt("serve id, vec from idx")) // unquoted
    assertThrows[Exception](Parser.parseStmt("serve id, vec from '/x' top 0"))
    assertThrows[Exception](Parser.parseStmt("serve id, vec from '/x' top 5000"))
    assertThrows[Exception](Parser.parseStmt("serve id, id from '/x'"))
    assertThrows[Exception](Parser.parseStmt("serve id, vec from '/x' extra"))
  }

  test("drift statement grammar: two tables via against") {
    val d = Parser.parseStmt("drift embedding from snap_a against snap_b")
      .asInstanceOf[Ast.DriftStmt]
    assert(d.vecCol == "embedding")
    assert(d.ref.table == "snap_a" && d.cur.table == "snap_b")
    assertThrows[Exception](Parser.parseStmt("drift embedding from a"))
    assertThrows[Exception](Parser.parseStmt("drift from a against b"))
    assertThrows[Exception](Parser.parseStmt("drift v from a against b extra"))
  }

  test("retention statement grammar") {
    val r = Parser.parseStmt("retention user_id, ts from events")
      .asInstanceOf[Ast.RetentionStmt]
    assert(r.userCol == "user_id" && r.tsCol == "ts" && r.from.table == "events")
    assert(Parser.parseStmt("retention u t from e")
      .isInstanceOf[Ast.RetentionStmt], "comma is optional")
    assertThrows[Exception](Parser.parseStmt("retention user_id from events"))
    assertThrows[Exception](Parser.parseStmt("retention a, a from events"))
    assertThrows[Exception](Parser.parseStmt("retention a, b from e extra"))
  }

  test("diff statement grammar: two tables via against") {
    val d = Parser.parseStmt("diff text from snap_a against snap_b")
      .asInstanceOf[Ast.DiffStmt]
    assert(d.textCol == "text")
    assert(d.old.table == "snap_a" && d.cur.table == "snap_b")
    assertThrows[Exception](Parser.parseStmt("diff text from a"))
    assertThrows[Exception](Parser.parseStmt("diff from a against b"))
    assertThrows[Exception](Parser.parseStmt("diff t from a against b extra"))
  }

  test("fertility statement grammar") {
    val f = Parser.parseStmt("fertility lang, text from documents")
      .asInstanceOf[Ast.FertilityStmt]
    assert(f.langCol == "lang" && f.textCol == "text")
    assertThrows[Exception](Parser.parseStmt("fertility lang from t"))
    assertThrows[Exception](Parser.parseStmt("fertility a, a from t"))
    assertThrows[Exception](Parser.parseStmt("fertility a, b from t extra"))
  }

  test("packing statement grammar: sizes list") {
    val p = Parser.parseStmt("packing doc_id, text from documents sizes 128, 256")
      .asInstanceOf[Ast.PackingStmt]
    assert(p.idCol == "doc_id" && p.textCol == "text")
    assert(p.sizes == Seq(128L, 256L))
    val d = Parser.parseStmt("packing doc_id, text from documents")
      .asInstanceOf[Ast.PackingStmt]
    assert(d.sizes == Seq(256L, 512L, 1024L), "sizes default to 256/512/1024")
    assertThrows[Exception](Parser.parseStmt("packing a, a from t"))
    assertThrows[Exception](Parser.parseStmt("packing a, b from t sizes 0"))
    assertThrows[Exception](Parser.parseStmt("packing a, b from t sizes 4, 4"))
    assertThrows[Exception](Parser.parseStmt("packing a, b from t extra"))
  }

  test("epochs statement grammar") {
    val e = Parser.parseStmt("epochs source, text from documents budget 5000")
      .asInstanceOf[Ast.EpochsStmt]
    assert(e.srcCol == "source" && e.textCol == "text" && e.budget == 5000L)
    val d = Parser.parseStmt("epochs src body from t")
      .asInstanceOf[Ast.EpochsStmt]
    assert(d.budget == 1000000L, "budget defaults to 1e6")
    assertThrows[Exception](Parser.parseStmt("epochs source from t"))
    assertThrows[Exception](Parser.parseStmt("epochs a, a from t"))
    assertThrows[Exception](Parser.parseStmt("epochs a, b from t budget 0"))
    assertThrows[Exception](Parser.parseStmt("epochs a, b from t extra"))
  }

  test("mix statement grammar: optional budget and per") {
    val m = Parser.parseStmt("mix doc_id, text from documents budget 500 per source")
      .asInstanceOf[Ast.MixStmt]
    assert(m.idCol == "doc_id" && m.textCol == "text")
    assert(m.budget == 500L && m.srcCol == "source")
    val d = Parser.parseStmt("mix id body from t").asInstanceOf[Ast.MixStmt]
    assert(d.budget == 800L && d.srcCol == "source")
    assertThrows[Exception](Parser.parseStmt("mix doc_id from documents"))
    assertThrows[Exception](Parser.parseStmt("mix id, text from t budget 0"))
    assertThrows[Exception](Parser.parseStmt("mix id, text from t extra"))
  }

  test("quantize statement grammar") {
    val q = Parser.parseStmt("quantize vec_id, embedding from embeddings")
      .asInstanceOf[Ast.QuantizeStmt]
    assert(q.idCol == "vec_id" && q.vecCol == "embedding")
    // comma between columns is optional, as everywhere in the dialect
    val q2 = Parser.parseStmt("quantize id vec from t")
      .asInstanceOf[Ast.QuantizeStmt]
    assert(q2.idCol == "id" && q2.vecCol == "vec")
    assertThrows[Exception](Parser.parseStmt("quantize id from t"))
    assertThrows[Exception](Parser.parseStmt("quantize id, vec from t extra"))
  }

  test("pack statement grammar: optional size") {
    val p = Parser.parseStmt("pack doc_id, text from documents size 256")
      .asInstanceOf[Ast.PackStmt]
    assert(p.idCol == "doc_id" && p.textCol == "text" && p.l == 256L)
    val d = Parser.parseStmt("pack id body from t").asInstanceOf[Ast.PackStmt]
    assert(d.l == 512L, "size defaults to 512")
    assertThrows[Exception](Parser.parseStmt("pack id body from t size 0"))
    assertThrows[Exception](Parser.parseStmt("pack id from t"))
    assertThrows[Exception](Parser.parseStmt("pack id body from t extra"))
  }

  test("profile statement grammar: bare table, nh, trailing garbage rejected") {
    val p = Parser.parseStmt("profile events").asInstanceOf[Ast.ProfileStmt]
    assert(p.from.table == "events" && !p.from.noHeader)
    val n = Parser.parseStmt("profile data.csv nh").asInstanceOf[Ast.ProfileStmt]
    assert(n.from.table == "data.csv" && n.from.noHeader)
    assertThrows[Exception](Parser.parseStmt("profile events extra"))
  }

  test("parseStmt still parses plain selects; parse rejects dedup") {
    val q = Parser.parseStmt("select a from t").asInstanceOf[Ast.Query]
    assert(q.items.size == 1)
    assertThrows[Exception](Parser.parse("dedup near a, b from t"))
  }
}
