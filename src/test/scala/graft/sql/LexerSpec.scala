package graft.sql

import org.scalatest.funsuite.AnyFunSuite
import Lexer._

class LexerSpec extends AnyFunSuite {

  test("operators, numbers, words, strings") {
    val toks = tokenize("select a + 1.5 >= 'x y' != \"z\" ^ 2")
    assert(toks.collect { case Op(o) => o } == Vector("+", ">=", "!=", "^"))
    assert(toks.collect { case Str(s) => s } == Vector("x y", "z"))
    assert(toks.collect { case Num(n) => n } == Vector("1.5", "2"))
  }

  test("doubled quotes escape inside strings") {
    assert(tokenize("'it''s'").collect { case Str(s) => s } == Vector("it's"))
  }

  test("unterminated string raises") {
    assertThrows[LexError](tokenize("select 'oops from t"))
  }

  test("paths are single tokens only after from/join; '/' is division elsewhere") {
    val toks = tokenize("select a / 2 from /data/x.csv")
    assert(toks.contains(Op("/")))
    assert(toks.collect { case Word(w) if w.startsWith("/") => w } ==
      Vector("/data/x.csv"))
    // identifier-adjacent slash stays arithmetic, never a path literal
    val div = tokenize("select revenue/quantity from t")
    assert(div.count { case Op("/") => true; case _ => false } == 1)
    assert(div.collect { case Word(w) => w } == Vector("select", "revenue", "quantity", "from", "t"))
    // relative paths with slashes and dots work in table context
    val rel = tokenize("from data/file.csv x join other.csv y")
    assert(rel.collect { case Word(w) if w.contains("/") || w.contains(".") => w } ==
      Vector("data/file.csv", "other.csv"))
  }

  test("statement-initial profile takes a path; a profile COLUMN divides") {
    val stmt = tokenize("profile /tmp/x.csv")
    assert(stmt.collect { case Word(w) if w.startsWith("/") => w } ==
      Vector("/tmp/x.csv"))
    // second statement after ';' is statement-initial too
    val multi = tokenize("select a from t; profile data/docs.parquet")
    assert(multi.collect { case Word(w) if w.contains("/") => w } ==
      Vector("data/docs.parquet"))
    // a column named profile followed by '/' stays arithmetic
    val div = tokenize("select profile / 2 from t")
    assert(div.contains(Op("/")))
    assert(!div.exists { case Word(w) => w.contains("/"); case _ => false })
  }
}
