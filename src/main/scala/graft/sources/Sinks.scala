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
        case _: TimestampType | _: TimestampNTZType =>
          // reference formats dates with Go's "2006-01-02 15:04:05"
          // layout — seconds precision, fraction dropped (value.go:494);
          // NTZ is what CSV-inferred date columns carry
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
    // Go Duration.String() in column algebra, µs-exact (Spark intervals
    // are microsecond-granular): all units below the leading one are
    // printed, one leading sign ("-1h30m0.5s"), sub-second values in
    // µs/ms forms with stripped fractions ("100ms", "1.5ms"). Mirrors
    // graft.sql.Durations.format — DurationsSpec cross-checks them.
    val us = (c.cast(DecimalType(20, 6)) * lit(1000000L)).cast(LongType) // exact total µs
    val a = abs(us)
    val sign = when(us < 0L, lit("-")).otherwise(lit(""))
    // whole."frac" with trailing zeros stripped; bare whole when frac=0
    def fracStr(whole: Column, part: Column, width: Int): Column =
      when(part === 0L, whole.cast(StringType)).otherwise(concat(
        whole.cast(StringType), lit("."),
        regexp_replace(lpad(part.cast(StringType), width, "0"), "0+$", "")))
    val subUs = concat(a.cast(StringType), lit("µs"))
    val subMs = concat(fracStr((a / 1000L).cast(LongType), a % 1000L, 3), lit("ms"))
    val h = (a / 3600000000L).cast(LongType)
    val m = ((a % 3600000000L) / 60000000L).cast(LongType)
    val secStr = fracStr(((a % 60000000L) / 1000000L).cast(LongType), a % 1000000L, 6)
    val hms = when(h > 0L,
        concat(h.cast(StringType), lit("h"), m.cast(StringType), lit("m"), secStr, lit("s")))
      .when(m > 0L, concat(m.cast(StringType), lit("m"), secStr, lit("s")))
      .otherwise(concat(secStr, lit("s")))
    when(c.isNull, lit(null)).otherwise(concat(sign,
      when(a === 0L, lit("0s"))
        .when(a < 1000L, subUs)
        .when(a < 1000000L, subMs)
        .otherwise(hms)))
  }

  /** Save as CSV at `path` (reference appends .csv when missing,
    * files.go:158-180). CLI convenience form: the result lands as ONE
    * actual .csv FILE at the path — Spark's writer always emits a
    * part-file directory, so the single coalesced part is moved over
    * the target afterward (a reference user expects `out.csv` to be a
    * file, not `out.csv/part-0000…`). Local-filesystem semantics on
    * purpose: this is the CLI path; the 100 TB path is
    * [[saveCsvDir]], which keeps parallel part files. */
  def saveCsv(df: DataFrame, path: String): String = {
    val p = if (path.endsWith(".csv")) path else path + ".csv"
    // the part-file move below uses java.io.File — valid only on the
    // local filesystem. On HDFS/S3 the write would succeed remotely
    // and then fail with a misleading "no part file" error, leaving
    // the remote tmp dir behind: fail fast instead.
    val scheme = new org.apache.hadoop.fs.Path(p).getFileSystem(
      df.sparkSession.sessionState.newHadoopConf()).getScheme
    if (scheme != "file")
      sys.error(s"saveCsv writes a single local .csv file; path scheme " +
        s"'$scheme' is not local — use saveCsvDir (parallel part files) instead")
    val tmp = p + ".__spark_tmp__"
    // escape=" gives RFC-4180 quote doubling (Go csv.Writer's form,
    // matching printCsv/saveCsvStreaming) instead of Spark's default
    // backslash escaping
    formatted(df).coalesce(1).write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("emptyValue", "") // bare empty, like the reference's Go csv.Writer
      .csv(tmp)
    val dir = new java.io.File(tmp)
    val part = Option(dir.listFiles()).getOrElse(Array.empty)
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".csv"))
      .getOrElse(sys.error(s"no part file written under $tmp"))
    val target = new java.io.File(p)
    if (target.isDirectory) org.apache.commons.io.FileUtils.deleteDirectory(target)
    java.nio.file.Files.move(part.toPath, target.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
    p
  }

  /** Parallel CSV save: every partition writes its own part file —
    * the 100 TB path (no single-task coalesce bottleneck). */
  def saveCsvDir(df: DataFrame, path: String): String = {
    formatted(df).write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("emptyValue", "") // bare empty, like the reference's Go csv.Writer
      .csv(path)
    path
  }

  /** Globally-shuffled training-shard writer: materializes the
    * t32_shard_layout addressing — shard by deterministic
    * multiplicative hash of `idCol`, position within shard by md5
    * order — as `shard=K/` parquet directories whose rows are stored
    * in `pos` order (repartition on shard + sortWithinPartitions, so
    * each shard's rows land in one sorted task; no global sort). A
    * training loader streaming shard files in order replays the same
    * hash-random global permutation on any cluster, every epoch. */
  def saveShards(df: DataFrame, idCol: String, nShards: Int,
      path: String): String = {
    import org.apache.spark.sql.functions._
    val shard = ((col(idCol) % lit(1000000L)) * lit(2654435761L)) % lit(nShards.toLong)
    df.withColumn("shard", shard)
      .withColumn("pos_key", md5(col(idCol).cast(org.apache.spark.sql.types.StringType)))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos_key"), col(idCol))
      .drop("pos_key")
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    path
  }

  /** Physical writer for a `shard` STATEMENT's result (doc_id, shard,
    * pos): land `shard=K/` parquet dirs whose rows are stored in pos
    * order — same layout contract as [[saveShards]], but consuming the
    * already-addressed frame instead of recomputing the addressing
    * (the CLI's `--save-shards` path). One shard-key repartition +
    * in-partition sort; no global sort. */
  def saveShardedResult(df: DataFrame, path: String): String = {
    import org.apache.spark.sql.functions.col
    val cols = df.columns.map(_.toLowerCase).toSet
    require(cols.contains("shard") && cols.contains("pos"),
      "--save-shards needs a result with shard and pos columns (the `shard` statement's output)")
    df.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
    path
  }

  /** Realtime single-file CSV save (reference files.go:85-156 streams
    * rows to the save file DURING execution, primed before the query
    * runs, main.go:124-131): header lands immediately, then rows are
    * appended and flushed as `toLocalIterator` drains each partition —
    * so a multi-hour scan shows partial output on disk, like the
    * reference, instead of nothing until the end. CLI convenience
    * form: executors still compute partitions in parallel; only the
    * final append is serialized through the driver, bounded by one
    * partition's rows in memory at a time. The 100 TB path remains
    * [[saveCsvDir]]. */
  def saveCsvStreaming(df: DataFrame, path: String): String = {
    val p = if (path.endsWith(".csv")) path else path + ".csv"
    val scheme = new org.apache.hadoop.fs.Path(p).getFileSystem(
      df.sparkSession.sessionState.newHadoopConf()).getScheme
    if (scheme != "file")
      sys.error(s"saveCsvStreaming appends to a single local .csv file; path " +
        s"scheme '$scheme' is not local — use saveCsvDir (parallel part files) instead")
    val target = new java.io.File(p)
    if (target.isDirectory) org.apache.commons.io.FileUtils.deleteDirectory(target)
    val f = formatted(df)
    // explicit UTF-8 — FileWriter would use the platform default
    // charset and silently mangle non-ASCII text on C-locale boxes
    val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(target), java.nio.charset.StandardCharsets.UTF_8))
    try {
      w.write(f.columns.map(csvField).mkString(",")); w.newLine(); w.flush()
      f.toLocalIterator().forEachRemaining { row =>
        w.write(csvLine(f.columns.length, row)); w.newLine(); w.flush()
      }
    } finally w.close()
    p
  }

  /** One CSV field — RFC-4180 quoting matching both Spark's writer
    * (with this object's options) and the reference's Go csv.Writer:
    * quote when the value carries a comma, quote, CR, or LF (embedded
    * quotes doubled); empty stays bare (Go never quotes empties — the
    * Spark writers set emptyValue="" to agree). */
  private def csvField(v: String): String =
    if (v.contains(",") || v.contains("\"") || v.contains("\n") || v.contains("\r"))
      "\"" + v.replace("\"", "\"\"") + "\""
    else v

  /** One already-formatted row as a CSV line (null → bare empty). */
  private def csvLine(ncols: Int, row: org.apache.spark.sql.Row): String =
    (0 until ncols).map { i =>
      if (row.isNullAt(i)) "" else csvField(row.getString(i))
    }.mkString(",")

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
      println(csvLine(f.columns.length, row))
    }
  }
}
