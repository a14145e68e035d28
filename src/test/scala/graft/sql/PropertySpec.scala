package graft.sql

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CsvSource

/** Property tests for the typing/inference surfaces SURVEY.md §7.4
  * ranks as the top correctness risks. Raw ScalaCheck generators,
  * sampled explicitly (the scalatest-plus bridge isn't in the offline
  * dependency cache). */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("trainSplit bucket arithmetic: splits partition every id, monotone in pct") {
    // pure integer replay of the builder's formula — both engines run
    // this exact arithmetic, so the property proves the CONTRACT the
    // oracle mirror relies on, not an implementation detail
    def bucket(id: Long): Long = ((id % 1000000L) * 2654435761L) % 100L
    val pcts = samples(for {
      a <- Gen.choose(1L, 98L)
      b <- Gen.choose(1L, 99L - a)
    } yield (a, b), 100)
    val ids = (0L until 3000L) ++ Seq(999999L, 1000000L, Long.MaxValue / 2654435761L)
    pcts.foreach { case (p1, p2) =>
      ids.foreach { id =>
        val b = bucket(id)
        val splits = Seq(b < p1, b >= p1 && b < p1 + p2, b >= p1 + p2)
        assert(splits.count(identity) == 1,
          s"id $id (bucket $b) must land in exactly one split for ($p1, $p2)")
      }
      // monotone: growing the train share never ejects a train row
      if (p1 < 98) {
        val grew = ids.filter(id => bucket(id) < p1)
        assert(grew.forall(id => bucket(id) < p1 + 1))
      }
    }
  }

  test("duration parse/format round-trips whole-second durations") {
    samples(Gen.choose(1L, 1000000L)).foreach { secs =>
      val d = java.time.Duration.ofSeconds(secs)
      val formatted = Durations.format(d)
      assert(Durations.parse(formatted).contains(d),
        s"$secs s → '$formatted' → ${Durations.parse(formatted)}")
    }
  }

  test("duration units are consistent multiples; y = 52w") {
    val s = Durations.parse("1s").get.getSeconds
    assert(Durations.parse("1m").get.getSeconds == 60 * s)
    assert(Durations.parse("1h").get.getSeconds == 3600 * s)
    assert(Durations.parse("1d").get.getSeconds == 24 * 3600 * s)
    assert(Durations.parse("1w").get.getSeconds == 7 * 24 * 3600 * s)
    assert(Durations.parse("1y").get.getSeconds == 52L * 7 * 24 * 3600 * s)
  }

  test("inference lattice: integers classify int, adding '.' makes float") {
    samples(Gen.choose(1L, Long.MaxValue / 2)).foreach { n =>
      assert(CsvSource.narrowest(n.toString) == CsvSource.LInt)
      assert(CsvSource.narrowest(s"$n.5") == CsvSource.LFloat)
    }
  }

  test("inference lattice: leading-zero integers always classify string") {
    samples(Gen.choose(1, 999999)).foreach { n =>
      assert(CsvSource.narrowest(s"0$n") == CsvSource.LStr)
    }
  }

  test("lattice ranks are a total widening order") {
    import CsvSource._
    val order: Seq[LatType] = Seq(LNull, LInt, LFloat, LDate, LDur, LStr)
    assert(order.map(_.rank) == order.map(_.rank).sorted)
    assert(order.map(_.rank).distinct.size == order.size)
  }

  test("statement splitting never splits inside quotes") {
    samples(for { a <- Gen.alphaStr; b <- Gen.alphaStr }
      yield s"select '$a;$b' from t; select 1 from u").foreach { s =>
      assert(Parser.splitStatements(s).size == 2)
    }
  }

  test("tokenHash stays within [0, P) for arbitrary ascii strings") {
    val P = graft.functions.TextFunctions.P
    samples(Gen.asciiPrintableStr).foreach { s =>
      val h = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % P)
      assert(h >= 0 && h < P)
    }
  }

  test("parser never crashes ungracefully on random token soup") {
    // malformed input must raise a controlled error (or parse), never a
    // StackOverflow/NPE/MatchError — a user typo must not kill a server
    val word = Gen.oneOf("select", "from", "where", "join", "on", "group",
      "by", "order", "top", "distinct", "case", "when", "then", "end",
      "and", "or", "not", "(", ")", ",", "=", "<", "+", "*", "'q'",
      "c1", "42", "3.5", ";", "t", "inc()", "sum", "between", "in", "like")
    val soup = Gen.chooseNum(1, 12)
      .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    samples(soup, n = 400).foreach { q =>
      try { Parser.parse(q); () }
      catch {
        case _: StackOverflowError | _: NullPointerException |
             _: MatchError =>
          fail(s"ungraceful parser crash on: $q")
        case _: Exception => () // controlled rejection is fine
      }
    }
  }
}
