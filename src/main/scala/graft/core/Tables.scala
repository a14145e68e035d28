package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over a scale-factor directory of parquet tables
  * (TESTDATA.md). Plays the role of the reference's file registry
  * (reference utils.go:507-570) generalized to Spark sources: a name
  * resolves to a DataFrame; paths ending in .csv/.parquet are read
  * directly, bare names resolve inside the directory.
  *
  * Scale note: `spark.read.parquet` keeps partitioning/pushdown in
  * Catalyst's hands — filters and projections land in the scan
  * (PushedFilters / ReadSchema), which is what makes the same code
  * viable at 100 TB on a real cluster.
  */
object Tables {
  val tpch: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val all: Seq[String] = tpch ++ Seq("events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name.endsWith(".parquet") || name.endsWith(".csv")) load(spark, name)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Load a direct path; CSV goes through the dialect-faithful
    * inference pass (graft.sources.CsvSource) once that lands. */
  def load(spark: SparkSession, path: String): DataFrame =
    if (path.endsWith(".csv"))
      spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    else spark.read.parquet(path)
}
