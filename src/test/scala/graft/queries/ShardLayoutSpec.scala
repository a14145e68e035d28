package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantic properties of the training-corpus layout ops (t32/t33)
  * that the hash gate alone doesn't state explicitly: the shard
  * addressing is a dense per-shard permutation, and the interleave
  * rank is a prefix-dense global order that round-robins sources. */
class ShardLayoutSpec extends SparkSpec {

  test("t32: (shard, pos) is a dense permutation — every shard numbers 0..n-1") {
    val layout = Registry.queries("t32_shard_layout")(spark, sf0001).cache()
    try {
      val total = layout.count()
      assert(layout.select("doc_id").distinct().count() == total)
      // per shard: pos is exactly 0..count-1 (dense, no dup, no gap)
      val bad = layout.groupBy("shard")
        .agg(count("*").as("n"), min("pos").as("lo"), max("pos").as("hi"),
          countDistinct("pos").as("nd"))
        .filter(col("lo") =!= 0L || col("hi") =!= col("n") - 1 || col("nd") =!= col("n"))
      assert(bad.isEmpty, bad.collect().mkString(","))
    } finally layout.unpersist()
  }

  test("t33: ranks are unique and the interleave prefix is dense across sources") {
    val il = Registry.queries("t33_source_interleave")(spark, sf0001).cache()
    try {
      val total = il.count()
      assert(il.select("rank").distinct().count() == total, "ranks must be unique")
      // while every source still has docs, the global order is strictly
      // round-robin: ranks 0 .. n_src*min_size-1 are all present
      val sizes = il.groupBy("source").count().collect()
      val nSrc = sizes.length.toLong
      val minSize = sizes.map(_.getLong(1)).min
      val prefix = nSrc * minSize
      val present = il.filter(col("rank") < prefix).count()
      assert(present == prefix,
        s"interleave prefix must be dense: ${present} of ${prefix} ranks present")
      // and within that prefix each source contributes exactly minSize docs
      val perSrc = il.filter(col("rank") < prefix).groupBy("source").count()
        .filter(col("count") =!= minSize)
      assert(perSrc.isEmpty, perSrc.collect().mkString(","))
    } finally il.unpersist()
  }
}
