package graft.core

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Distributed global row numbering — the scale path for the dialect's
  * `inc()` (reference selector.go:204-207) and any "number the whole
  * result" need.
  *
  * A window over a global ORDER BY funnels every row through one
  * partition; this instead range-partitions on the order columns,
  * sorts within partitions, computes per-partition counts (one small
  * job), and adds partition offsets — the classic zipWithIndex shape,
  * all partitions working in parallel. Cost: one extra count pass;
  * no single-task bottleneck at any scale.
  */
object RowNumbers {

  def global(df: DataFrame, order: Seq[org.apache.spark.sql.Column],
      name: String = "rn", step: Double = 1.0,
      numPartitions: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    val parts = numPartitions.getOrElse(spark.sessionState.conf.numShufflePartitions)
    val sorted = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
    val counts = sorted.rdd
      .mapPartitionsWithIndex((i, it) => Iterator((i, it.size.toLong)))
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _) // offsets(i) = rows before partition i
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(df.schema.fields :+ StructField(name, DoubleType, nullable = false))
    val rdd = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      val base = bcOffsets.value(i)
      it.zipWithIndex.map { case (r, j) =>
        Row.fromSeq(r.toSeq :+ (base + j + 1) * step)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
