package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types._

/** Distributed global row numbering — the scale path for the dialect's
  * `inc()` (reference selector.go:204-207) and any "number the whole
  * result" need.
  *
  * A window over a global ORDER BY funnels every row through one
  * partition; this uses RDD `zipWithIndex` instead: one small job
  * counts rows per partition, then every partition numbers itself in
  * parallel from its broadcast offset — no single-task bottleneck at
  * any scale, no `Exchange SinglePartition` in any plan.
  *
  * Why RDD-level rather than a DataFrame self-join on
  * `spark_partition_id()`: the two internal jobs must see IDENTICAL
  * partitioning. Two separate DataFrame actions re-plan independently —
  * under AQE the same shuffle can coalesce differently per action and
  * the collected offsets would describe partitions that no longer
  * exist (observed: q23 off-by-k at sf0.01 with AQE on). zipWithIndex
  * runs both jobs on the SAME RDD instance: partitioning is fixed once
  * and shuffle outputs are reused, so the count pass and the numbering
  * pass agree by construction. The cost is one serialization boundary
  * (a pipeline breaker, like any shuffle) — the numbering operator is
  * inherently two-phase anyway.
  */
object RowNumbers {

  /** Attach `name` = step · (1-based row index in natural scan order —
    * (partition, offset) order, matching the reference's single-
    * threaded scan counter). */
  def scanOrder(df: DataFrame, name: String = "rn", step: Double = 1.0): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(df.schema.fields :+
      StructField(name, DoubleType, nullable = false))
    val rdd = df.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1) * step)
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Ordered numbering: range-partition on `order` + sort within
    * partitions (ranges are ordered across partitions, so scan order
    * of the sorted frame IS the global order), then zip. */
  def global(df: DataFrame, order: Seq[Column], name: String = "rn",
      step: Double = 1.0, numPartitions: Option[Int] = None): DataFrame = {
    val parts = numPartitions.getOrElse(
      df.sparkSession.sessionState.conf.numShufflePartitions)
    scanOrder(df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*), name, step)
  }
}
