package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gated query: a Spark build and (when SQL-expressible)
  * an equivalent DuckDB oracle over the same parquet tables. Column
  * names must match exactly between the two (the driver sorts columns
  * by name before hashing). `bench = true` marks headline queries that
  * graft.Bench times per round. */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)

object Registry {
  lazy val all: Seq[Q] =
    CoreQueries.all ++ DialectQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ VectorQueries.all ++ EventQueries.all ++
      MultimodalQueries.all ++ ApproxQueries.all ++ PipelineQueries.all ++
      PipelineQueries.report

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  lazy val benchQueries: Seq[Q] = all.filter(_.bench)
}
