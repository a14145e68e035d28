package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: the co-located-join path for repeated
  * fact-fact joins. A big join shuffles BOTH sides on the key every
  * time it runs; bucketing pays that shuffle ONCE at write time — both
  * tables hash-partitioned and sorted into the same number of buckets
  * on the join key — after which every join on that key is a
  * sort-merge over co-located buckets with NO exchange on either side
  * (BucketingSpec pins the plan). At 100 TB, pre-bucketing the fact
  * tables on the frequent join key is the difference between a
  * per-query multi-TB shuffle and none. */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table registered as
    * `name` (path `warehouse/name`). `buckets` must match across
    * tables meant to join shuffle-free. */
  def writeBucketed(df: DataFrame, name: String, key: String, buckets: Int,
      warehouse: String): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", s"$warehouse/$name")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(name)

  /** The bucketed table as a DataFrame (bucket metadata attached — a
    * plain spark.read.parquet of the path would NOT know the
    * bucketing and would shuffle). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
