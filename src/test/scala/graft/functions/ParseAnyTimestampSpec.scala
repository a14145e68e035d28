package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import ParseAnyTimestamp.parse_any_ts

class ParseAnyTimestampSpec extends SparkSpec {
  import spark.implicits._

  test("parses the permissive pattern chain; null when no match") {
    val got = Seq(
      "2020-01-02 10:11:12", "2020-01-02T10:11:12", "2020-01-02",
      "2020/01/02", "01/02/2020", "1/2/2020", "Jan 2 2020",
      "January 2, 2020", "notadate", "")
      .toDF("s").select(parse_any_ts(col("s")).cast("string")).as[String]
      .collect()
    assert(got(0) == "2020-01-02 10:11:12")
    assert(got(1) == "2020-01-02 10:11:12")
    (2 to 7).foreach(i => assert(got(i) == "2020-01-02 00:00:00", s"idx $i → ${got(i)}"))
    assert(got(8) == null && got(9) == null)
  }

  test("broadened dateparse surface: epochs, dashes, month names, RFC3339") {
    val cases = Seq(
      "1577959872"                 -> "2020-01-02 10:11:12", // epoch seconds
      "1577959872000"              -> "2020-01-02 10:11:12", // epoch millis
      "1577959872000000"           -> "2020-01-02 10:11:12", // epoch micros
      "1577959872000000000"        -> "2020-01-02 10:11:12", // epoch nanos
      "20200102"                   -> "2020-01-02 00:00:00", // yyyyMMdd
      "01-02-2020"                 -> "2020-01-02 00:00:00", // US dashes, month first
      "02-Jan-2020"                -> "2020-01-02 00:00:00", // dd-MMM-yyyy
      "Jan 2, 2020"                -> "2020-01-02 00:00:00",
      "FEB 3, 2013"                -> "2013-02-03 00:00:00", // case-insensitive
      "2 January 2020"             -> "2020-01-02 00:00:00",
      "2020-01-02T10:11:12Z"       -> "2020-01-02 10:11:12", // RFC3339 UTC
      "2020-01-02T10:11:12+02:00"  -> "2020-01-02 08:11:12", // zone → UTC wall clock
      "2020-01-02 10:11:12.5"      -> "2020-01-02 10:11:12.5",
      "2020/01/02 10:11:12"        -> "2020-01-02 10:11:12",
      "01/02/2020 10:11"           -> "2020-01-02 10:11:00",
      "2020-01-02 10:11:12.5+02:00" -> "2020-01-02 08:11:12.5", // fraction before zone
      "02.01.2020"                 -> "2020-01-02 00:00:00", // dotted European, day first
      "2.1.2020"                   -> "2020-01-02 00:00:00",
      "2020.01.02"                 -> "2020-01-02 00:00:00", // dotted year-first
      "2020-01"                    -> "2020-01-01 00:00:00", // yyyy-MM month form
      "Thu Jan 2 10:11:12 2020"    -> "2020-01-02 10:11:12", // unix date
      "Thu Jan  2 10:11:12 2020"   -> "2020-01-02 10:11:12", // unix date, padded day
      "12-04"                      -> null, // short numeric pair: not a month form
      "3.14"                       -> null, // two dotted components: not a date
      "123456789"                  -> null, // 9 digits: not a date width
      "9999999999999999999"        -> null, // 19 digits > Long.MaxValue: null, not a crash
      "12345"                      -> null)
    val got = cases.map(_._1)
      .toDF("s").select(parse_any_ts(col("s")).cast("string")).as[String]
      .collect()
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"'$in' → '$g', want '$want'")
    }
  }

  test("works under whole-stage codegen on a real column") {
    val df = Seq.tabulate(1000)(i => f"2021-${i % 12 + 1}%02d-${i % 28 + 1}%02d")
      .toDF("s").select(parse_any_ts(col("s")).as("ts"))
    assert(df.filter(col("ts").isNotNull).count() == 1000)
  }

  test("registered SQL function") {
    ParseAnyTimestamp.register(spark)
    val n = spark.sql("SELECT parse_any_ts('2020-05-06') AS t").collect().head
    assert(n.get(0).toString.startsWith("2020-05-06"))
  }
}
