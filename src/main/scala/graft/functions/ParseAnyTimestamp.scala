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
  import java.time.format.DateTimeFormatter
  import java.time.{LocalDate, LocalDateTime}

  private val dateTimeFormats = Seq(
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"),
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"))
  private val dateFormats = Seq(
    DateTimeFormatter.ofPattern("yyyy-MM-dd"),
    DateTimeFormatter.ofPattern("yyyy/MM/dd"),
    DateTimeFormatter.ofPattern("MM/dd/yyyy"),
    DateTimeFormatter.ofPattern("M/d/yyyy"),
    DateTimeFormatter.ofPattern("MMM d yyyy"),
    DateTimeFormatter.ofPattern("MMMM d, yyyy"))

  /** Parse to epoch micros (LocalDateTime semantics, NTZ); null when
    * no pattern matches. Called from both interpreted eval and
    * generated code. */
  def parseMicros(s: UTF8String): java.lang.Long = {
    if (s == null) return null
    val v = s.toString.trim
    if (v.isEmpty) return null
    // fast path: ISO yyyy-MM-dd[ HH:mm:ss] dominates real data
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
