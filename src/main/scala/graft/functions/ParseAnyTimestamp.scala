package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for permissive timestamp parsing — the
  * analog of the reference's dateparse.ParseAny inference path
  * (reference utils.go:392-397). A chain of 8 try_to_timestamp calls
  * costs 8 parser setups per cell; this tries the pattern chain in one
  * expression with a static fast path, and stays codegen-compatible by
  * emitting a single static call (whole-stage codegen keeps its span —
  * SURVEY.md §7.2 flags this as the one worthwhile custom Expression).
  */
case class ParseAnyTimestamp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TimestampNTZType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"parse_any_ts needs a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    ParseAnyTimestamp.parseMicros(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = ParseAnyTimestamp.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |Object parsed = $cls.parseMicros($c);
         |if (parsed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) parsed).longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): ParseAnyTimestamp =
    copy(child = newChild)
}

object ParseAnyTimestamp {
  import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
  import java.time.temporal.ChronoField
  import java.time.{LocalDate, LocalDateTime, OffsetDateTime, ZoneOffset}
  import java.util.Locale

  /** Case-insensitive US-locale formatter ("FEB 3, 2013" parses too —
    * dateparse is case-insensitive on month names). */
  private def fmt(pattern: String): DateTimeFormatter =
    new DateTimeFormatterBuilder().parseCaseInsensitive()
      .appendPattern(pattern).toFormatter(Locale.US)

  /** Datetime pattern + optional fractional seconds (1-9 digits). */
  private def fmtFrac(pattern: String): DateTimeFormatter =
    new DateTimeFormatterBuilder().parseCaseInsensitive()
      .appendPattern(pattern)
      .optionalStart()
      .appendFraction(ChronoField.NANO_OF_SECOND, 1, 9, true)
      .optionalEnd()
      .toFormatter(Locale.US)

  // the dateparse.ParseAny surface (reference utils.go:392-397),
  // ordered by real-world frequency: ISO first, then US slash/dash
  // forms, month-name forms, compact/epoch digits, RFC3339 with zone
  private val dateTimeFormats = Seq(
    fmtFrac("yyyy-MM-dd HH:mm:ss"),
    fmtFrac("yyyy-MM-dd'T'HH:mm:ss"),
    fmtFrac("yyyy/MM/dd HH:mm:ss"),
    fmtFrac("MM/dd/yyyy HH:mm:ss"),
    fmtFrac("M/d/yyyy H:mm:ss"),
    fmt("yyyy-MM-dd HH:mm"),
    fmt("MM/dd/yyyy HH:mm"),
    fmt("EEE MMM d HH:mm:ss yyyy")) // unix `date` output: Mon Jan 2 15:04:05 2006
  private val dateFormats = Seq(
    fmt("yyyy-MM-dd"),
    fmt("yyyy/MM/dd"),
    fmt("MM/dd/yyyy"),
    fmt("M/d/yyyy"),
    fmt("MM-dd-yyyy"),   // US dashes (dateparse prefers month-first)
    fmt("dd-MMM-yyyy"),  // 02-Jan-2006
    fmt("MMM d yyyy"),
    fmt("MMM d, yyyy"),  // Feb 3, 2013
    fmt("MMMM d yyyy"),
    fmt("MMMM d, yyyy"), // February 3, 2013
    fmt("d MMM yyyy"),   // 3 Feb 2013
    fmt("d MMMM yyyy"),
    fmt("yyyy.M.d"),     // dotted year-first (2006.01.02)
    fmt("d.M.yyyy"),     // dotted European day-first (02.01.2006, 2.1.2006)
    // yyyy-MM month form (2014-04 → first of month); the 4-digit-year
    // requirement keeps short numeric pairs (12-04) unparseable
    new DateTimeFormatterBuilder().parseCaseInsensitive()
      .appendPattern("yyyy-MM")
      .parseDefaulting(ChronoField.DAY_OF_MONTH, 1)
      .toFormatter(Locale.US))
  /** Datetime + optional fraction BETWEEN seconds and the zone suffix
    * ('2020-01-02 10:11:12.5+02:00' / '... .5 +0000'). */
  private def fmtFracZone(base: String, zone: String): DateTimeFormatter =
    new DateTimeFormatterBuilder().parseCaseInsensitive()
      .appendPattern(base)
      .optionalStart()
      .appendFraction(ChronoField.NANO_OF_SECOND, 1, 9, true)
      .optionalEnd()
      .appendPattern(zone)
      .toFormatter(Locale.US)
  private val zonedFormats = Seq(
    DateTimeFormatter.ISO_OFFSET_DATE_TIME, // RFC3339 incl. Z / ±hh:mm
    fmtFracZone("yyyy-MM-dd HH:mm:ss", "XXX"),
    fmtFracZone("yyyy-MM-dd HH:mm:ss", " XXX"),
    fmtFracZone("yyyy-MM-dd HH:mm:ss", " Z"))

  /** All-digit strings, dateparse conventions: 8 = yyyyMMdd; 10/13/
    * 16/19 digits = epoch seconds/millis/micros/nanos. Any other width
    * is NOT a date (a numeric id must never misparse), and anything
    * unparseable — e.g. 19 digits above Long.MaxValue — is null, never
    * an exception (one bad cell must not kill a scan). */
  private def digitsToMicros(v: String): java.lang.Long =
    try v.length match {
      case 8 => java.lang.Long.valueOf(DateTimeUtils.localDateTimeToMicros(
        LocalDate.parse(v, DateTimeFormatter.BASIC_ISO_DATE).atStartOfDay))
      case 10 => java.lang.Long.valueOf(Math.multiplyExact(v.toLong, 1000000L))
      case 13 => java.lang.Long.valueOf(Math.multiplyExact(v.toLong, 1000L))
      case 16 => java.lang.Long.valueOf(v.toLong)
      case 19 => java.lang.Long.valueOf(v.toLong / 1000L)
      case _ => null
    } catch { case _: Exception => null }

  /** Parse to epoch micros (LocalDateTime semantics, NTZ; zoned inputs
    * are converted to their UTC wall-clock); null when no pattern
    * matches. Called from both interpreted eval and generated code. */
  def parseMicros(s: UTF8String): java.lang.Long = {
    if (s == null) return null
    var v = s.toString.trim
    if (v.isEmpty) return null
    // unix `date` pads single-digit days with a double space
    // (Mon Jan  2 15:04:05 2006); collapse only when one is present
    if (v.indexOf("  ") >= 0) v = v.replaceAll(" +", " ")
    if (v.forall(_.isDigit)) return digitsToMicros(v)
    dateTimeFormats.foreach { f =>
      try return java.lang.Long.valueOf(
        DateTimeUtils.localDateTimeToMicros(LocalDateTime.parse(v, f)))
      catch { case _: Exception => () }
    }
    dateFormats.foreach { f =>
      try return java.lang.Long.valueOf(
        DateTimeUtils.localDateTimeToMicros(LocalDate.parse(v, f).atStartOfDay))
      catch { case _: Exception => () }
    }
    zonedFormats.foreach { f =>
      try return java.lang.Long.valueOf(DateTimeUtils.localDateTimeToMicros(
        OffsetDateTime.parse(v, f).withOffsetSameInstant(ZoneOffset.UTC).toLocalDateTime))
      catch { case _: Exception => () }
    }
    null
  }

  /** Column builder (Spark 4 Column↔Expression bridge). */
  def parse_any_ts(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(ParseAnyTimestamp(Bridge.expression(c)))
  }

  /** SQL registration (parse_any_ts usable from spark.sql). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "parse_any_ts", exprs => ParseAnyTimestamp(exprs.head), "scala_udf")
}
