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

  test("absolute paths are single tokens; bare slash is division") {
    val toks = tokenize("select a / 2 from /data/x.csv")
    assert(toks.contains(Op("/")))
    assert(toks.collect { case Word(w) if w.startsWith("/") => w } ==
      Vector("/data/x.csv"))
  }

  test("dotted names lex as word-dot-word for the parser to rejoin") {
    val toks = tokenize("from cities.csv")
    assert(toks == Vector(Word("from"), Word("cities"), Op("."), Word("csv"), EOF))
  }
}
