package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.sql.Durations

class CsvSourceSpec extends SparkSpec {

  test("narrowest-type lattice (reference getNarrowestType)") {
    import CsvSource._
    assert(narrowest("") == LNull)
    assert(narrowest("null") == LNull)
    assert(narrowest("NA") == LNull)
    assert(narrowest("42") == LInt)
    assert(narrowest("-3") == LInt)
    assert(narrowest("3.14") == LFloat)
    assert(narrowest("1e5") == LFloat)
    assert(narrowest("007") == LStr)      // leading-zero ID protection
    assert(narrowest("2020-01-02") == LDate)
    assert(narrowest("2020-01-02 10:11:12") == LDate)
    assert(narrowest("02.01.2020") == LDate)               // dotted European
    assert(narrowest("2020-01") == LDate)                  // yyyy-MM month form
    assert(narrowest("Thu Jan  2 10:11:12 2020") == LDate) // unix date
    assert(narrowest("3.14") == LFloat)                    // dots stay numeric first
    assert(narrowest("5 minutes") == LDur)
    assert(narrowest("72h3m") == LDur)
    assert(narrowest("hello") == LStr)
  }

  test("duration parsing: units incl. y=52w, go-style compound") {
    assert(Durations.parse("90s").get.getSeconds == 90)
    assert(Durations.parse("5 minutes").get.getSeconds == 300)
    assert(Durations.parse("2h").get.getSeconds == 7200)
    assert(Durations.parse("1 week").get.getSeconds == 7 * 86400)
    assert(Durations.parse("1y").get.getSeconds == 52L * 7 * 86400)
    assert(Durations.parse("1h30m").get.getSeconds == 5400)
    // Go semantics: sign applies to the whole compound; ms parses
    assert(Durations.parse("-1h30m").get.getSeconds == -5400)
    assert(Durations.parse("100ms").get.toMillis == 100)
    assert(Durations.parse("nope").isEmpty)
    // Go Duration.String() fidelity: all units below the leading one
    assert(Durations.format(java.time.Duration.ofSeconds(5400)) == "1h30m0s")
    assert(Durations.format(java.time.Duration.ofSeconds(90)) == "1m30s")
    assert(Durations.format(java.time.Duration.ofSeconds(7200)) == "2h0m0s")
    assert(Durations.format(java.time.Duration.ZERO) == "0s")
  }

  test("csv read: inference, widening, headerless naming") {
    val dir = Files.createTempDirectory("graftcsv")
    val f = dir.resolve("sample.csv")
    Files.writeString(f,
      """id,amount,when,span,tag,zip
        |1,3.5,2020-01-02,5m,alpha,00501
        |2,4,2020-02-03 10:00:00,2h,beta,10001
        |,null,NA,,gamma,
        |""".stripMargin)
    val df = CsvSource.read(spark, f.toString)
    val types = df.schema.fields.map(x => (x.name, x.dataType.typeName)).toMap
    assert(types("id") == "long")
    assert(types("amount") == "double")      // widened int→float
    assert(types("when").startsWith("timestamp")) // NTZ: faithful no-tz parse
    assert(types("span").startsWith("daytimeinterval") || types("span").startsWith("interval"))
    assert(types("tag") == "string")
    assert(types("zip") == "string")         // leading zero forces string
    assert(df.count() == 3)
    val r1 = df.filter("id = 1").collect().head
    assert(r1.getDouble(1) == 3.5)

    val nh = dir.resolve("nohdr.csv")
    Files.writeString(nh, "1,x\n2,y\n")
    val df2 = CsvSource.read(spark, nh.toString, header = false)
    assert(df2.columns.sameElements(Seq("col1", "col2")))
  }

  test("quoted cells keep embedded commas; cells trim on read (selector.go:301)") {
    val dir = Files.createTempDirectory("graftquoted")
    val f = dir.resolve("quoted.csv")
    Files.writeString(f,
      "name,note,num\n" +
      "\"a, b\",\"  spaced  \", 42\n" +
      "c,x,7\n")
    val df = CsvSource.read(spark, f.toString)
    val types = df.schema.fields.map(x => (x.name, x.dataType.typeName)).toMap
    assert(types("num") == "long") // " 42" trims before typing
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.contains(("a, b", "spaced", 42L)), rows.mkString(";"))
    assert(rows.contains(("c", "x", 7L)))
  }

  test("inference samples only the first 10k rows (reference utils.go:434)") {
    val dir = Files.createTempDirectory("graftcutoff")
    val f = dir.resolve("mixed.csv")
    val sb = new StringBuilder("v\n")
    (1 to 10000).foreach(i => sb.append(i).append('\n'))
    sb.append("10000.5\n") // row 10001: float — beyond the sample window
    Files.writeString(f, sb.toString)
    val df = CsvSource.read(spark, f.toString)
    assert(df.schema.fields.head.dataType.typeName == "long")
    // the unsampled float cell can't cast to long → null (documented
    // divergence: the reference's Go parser yields a zero value)
    assert(df.filter("v IS NULL").count() == 1)
  }
}
