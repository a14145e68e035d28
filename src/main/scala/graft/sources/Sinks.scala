package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Output sinks with the reference's value formatting
  * (reference value.go:494-497): floats as %.10g, timestamps as
  * "yyyy-MM-dd HH:mm:ss", durations Go-style. CSV save semantics per
  * reference files.go:85-180: `.csv` appended when missing, multi-query
  * saves suffixed `-N`.
  */
object Sinks {

  /** Format every column to its reference string form (distributed —
    * formatting happens in executors, not the driver). */
  def formatted(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      val c = col(f.name)
      (f.dataType match {
        case _: DoubleType | _: FloatType =>
          // Go %.10g strips trailing zeros (reference value.go:494);
          // Java %g keeps them — normalize to the Go form
          val g = format_string("%.10g", c)
          val noExpZeros = regexp_replace(g, "\\.?0+e", "e")
          val plain = regexp_replace(regexp_replace(g, "(\\.\\d*?)0+$", "$1"), "\\.$", "")
          when(c.isNull, lit(null))
            .otherwise(when(g.contains("e"), noExpZeros).otherwise(plain))
        case _: TimestampType =>
          date_format(c, "yyyy-MM-dd HH:mm:ss")
        case _: DayTimeIntervalType =>
          // Go Duration.String(): HhMmSs with units omitted when zero
          formatDuration(c)
        case _ => c.cast(StringType)
      }).as(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  private def formatDuration(c: Column): Column = {
    // Go Duration.String(): all units below the leading one are
    // printed; one leading sign for negative values ("-1h30m0s", not
    // "-1h-30m0s"). Sub-second fractions are truncated (dialect
    // durations are second-granular after parsing).
    val signed = c.cast("long") // interval → total seconds
    val totalSecs = abs(signed)
    val sign = when(signed < 0L, lit("-")).otherwise(lit(""))
    val h = (totalSecs / 3600L).cast(LongType)
    val m = ((totalSecs % 3600L) / 60L).cast(LongType)
    val s = (totalSecs % 60L).cast(LongType)
    val hms = concat(h.cast(StringType), lit("h"), m.cast(StringType), lit("m"),
      s.cast(StringType), lit("s"))
    val ms = concat(m.cast(StringType), lit("m"), s.cast(StringType), lit("s"))
    val just = concat(s.cast(StringType), lit("s"))
    when(c.isNull, lit(null)).otherwise(concat(sign,
      when(h =!= 0, hms).otherwise(when(m =!= 0, ms).otherwise(just))))
  }

  /** Save as CSV at `path` (reference appends .csv when missing,
    * files.go:158-180). Spark-native form: a directory with one
    * coalesced part file — at scale, drop the coalesce(1) and let each
    * partition write in parallel. */
  def saveCsv(df: DataFrame, path: String): String = {
    val p = if (path.endsWith(".csv")) path else path + ".csv"
    formatted(df).coalesce(1).write.mode("overwrite")
      .option("header", "true").csv(p)
    p
  }

  /** Multi-query save paths: base, base-2, base-3 ...
    * (reference files.go:85-156). */
  def savePaths(base: String, n: Int): Seq[String] = {
    val stripped = base.replaceAll("\\.csv$", "")
    (1 to n).map(i => if (i == 1) s"$stripped.csv" else s"$stripped-$i.csv")
  }

  /** Print a result to stdout as CSV (CLI mode, reference main.go:149-158).
    * Bounded by `limit` rows to keep the driver safe. */
  def printCsv(df: DataFrame, limit: Int = 100000): Unit = {
    val f = formatted(df)
    println(f.columns.mkString(","))
    f.limit(limit).toLocalIterator().forEachRemaining { row =>
      println(f.columns.indices.map { i =>
        val v = if (row.isNullAt(i)) "" else row.getString(i)
        if (v.contains(",") || v.contains("\"") || v.contains("\n"))
          "\"" + v.replace("\"", "\"\"") + "\""
        else v
      }.mkString(","))
    }
  }
}
