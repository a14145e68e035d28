package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: for every left row, the single right row
  * with the greatest `right.ts <= left.ts` in the same key group — the
  * time-series / feature-lookup join Spark has no native operator for.
  *
  * Shape: tag the two sides, union them, and carry the most recent
  * right payload forward with `last(_, ignoreNulls)` over a
  * (key, ts, side)-ordered running window — ONE shuffle on the key and
  * a linear scan per group. The naive formulation
  * (`l JOIN r ON l.k = r.k AND r.ts <= l.ts` then max-per-left-row) is
  * a partial cartesian inside every key group: quadratic in group size,
  * hopeless at 100 TB. The union-scan form is linear, needs no range
  * condition, and its single hash exchange is AQE-skew-splittable.
  *
  * Determinism: right rows sort before left rows at the same timestamp
  * (side 0 < side 1), so the match is inclusive; among right rows that
  * share (key, ts) the greatest `tiebreak` wins. Running `last()` over
  * rows-between-unbounded-preceding is order-sensitive by design —
  * exactly the semantics wanted — and WindowGroupLimit does not apply
  * (every row is kept), so the cost is the one sort behind the window.
  */
object AsofJoin {

  /** Left rows joined with the latest right payload at-or-before their
    * timestamp. Right `payload` columns come back `prefix`-renamed,
    * null when no right row precedes the left row (left-outer
    * semantics, like DuckDB's `ASOF LEFT JOIN`). NB: null KEYS group
    * together here (window partitioning), whereas SQL join equality
    * would drop them — pre-filter null keys if that distinction
    * matters for your data. */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      payload: Seq[String],
      prefix: String = "asof_",
      tiebreak: Option[String] = None): DataFrame = {
    val tb = tiebreak.map(c => right(c).cast("long")).getOrElse(lit(0L))
    val r = right.select(
      right(key).as("__k"), right(ts).as("__t"), lit(0).as("__side"),
      tb.as("__tb"),
      // deterministic final tiebreak: right rows sharing (key, ts,
      // tiebreak) would otherwise order partition-dependently and
      // last(__pay) would pick a run-to-run nondeterministic payload
      xxhash64(struct(payload.map(right(_)): _*)).as("__tb2"),
      struct(payload.map(right(_)): _*).as("__pay"))
    val payType = r.schema("__pay").dataType
    val leftCols = left.columns.toSeq
    val l = left.select(
      left(key).as("__k"), left(ts).as("__t"), lit(1).as("__side"),
      lit(0L).as("__tb"), lit(0L).as("__tb2"),
      lit(null).cast(payType).as("__pay"),
      struct(leftCols.map(left(_)): _*).as("__lrow"))
    val u = r.withColumn("__lrow", lit(null).cast(l.schema("__lrow").dataType))
      .unionByName(l)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc, col("__tb2").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__lrow.$c").as(c)) ++
        payload.map(p => col(s"__m.$p").as(s"$prefix$p")): _*)
  }
}
