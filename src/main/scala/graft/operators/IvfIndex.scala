package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.queries.VectorQueries

/** The persisted IVF index lifecycle — the storage half of the ANN
  * story (the v45 layout, factored out of the gate so the dialect's
  * `index` / `serve` / `repair … using` statements and the upsert
  * path share ONE implementation).
  *
  * Layout: a cell-partitioned parquet directory (hive partitioning on
  * `cell`, the s19 pay-the-shuffle-once pattern applied to the vector
  * index). Every lifecycle operation then turns its cell set into a
  * STATIC partition predicate, so the scan READS only those cells'
  * files (`PartitionFilters` in the plan):
  *  - serve: the query batch's union of probed cells;
  *  - repair: the refresh's dirty cells;
  *  - upsert: the arrivals' touched cells (dynamic partition
  *    overwrite rewrites ONLY those — untouched cells' files stay
  *    byte-identical, R11OpsSpec-pinned).
  * At 100 TB that is the difference between an O(touched fraction)
  * maintenance op and a corpus rescan.
  */
object IvfIndex {

  /** Persist an assigned (vec_id, embedding, cell) frame as the
    * cell-partitioned layout. The explicit RANGE repartition on
    * (cell, vec_id) pays ONE shuffle so each task writes a contiguous
    * cell slice: ~shuffle-partitions files total, each cell's file
    * count proportional to its occupancy. (Hash-repartitioning on the
    * cell alone collapses k cells onto ≤k writer tasks — k huge
    * single-row-group files that cap READ parallelism at k: the
    * round-11 probe read the k=4 layout 2× slower than the flat
    * corpus. No repartition at all is worse still — every task writes
    * a sliver of every cell, tasks×cells tiny files.) */
  def write(assigned: DataFrame, path: String): Unit = {
    val n = assigned.sparkSession.sessionState.conf.numShufflePartitions
    assigned.select(col("vec_id"), col("embedding"),
        col("cell").cast(LongType).as("cell"))
      .repartitionByRange(n, col("cell"), col("vec_id"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
  }

  /** Build an index at `path` from a raw (vec_id, embedding) frame:
    * sample-bounded k-means fit (≤256·k training vectors whatever the
    * corpus size), ONE full assignment pass, cell-partitioned write.
    * Returns the serving centers — the frozen artifact every other
    * lifecycle op (serve routing, stream ingest, repair dirty-set)
    * scores against. */
  def build(e: DataFrame, path: String, k: Int = VectorQueries.KMEANS_K)
      : Seq[(Int, Array[Double])] = {
    val centers = VectorQueries.kmeansFit(e, k, VectorQueries.KMEANS_ITERS - 1)
    write(VectorQueries.kmeansAssign(e, centers), path)
    centers
  }

  /** Read the index back. The hive partition key comes back INT-typed
    * — normalize to the BIGINT cell contract every consumer pins. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select(col("vec_id"), col("embedding"),
      col("cell").cast(LongType).as("cell"))

  /** Partition-pruned serving: top-`k` cosine neighbors within each
    * query's own cell. `panel` is (q_id, q_emb, cell) — the probed
    * cells collect is ≤ panel-size rows (driver-side routing), and
    * the union of probed cells becomes a static partition predicate
    * on the index scan, so serving READS only those cells' files. */
  def serve(idx: DataFrame, panel: DataFrame, k: Int): DataFrame = {
    val probed = panel.select(col("cell")).distinct().collect()
      .map(_.get(0).asInstanceOf[Number].longValue()).sorted.toSeq
    val pruned =
      if (probed.isEmpty) idx.filter(lit(false)) else
        idx.filter(col("cell").isin(probed: _*))
    val sims = pruned
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        col("cell"))
      .join(broadcast(panel), "cell")
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        VectorQueries.cosine(col("q_emb"), col("n_emb")).as("sim"))
    val wr = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id").asc)
    sims.withColumn("rank", row_number().over(wr).cast(LongType))
      .filter(col("rank") <= k)
  }

  /** Incremental upsert: land `assigned` arrivals (vec_id, embedding,
    * cell — already scored against the index's FROZEN centers, the
    * v28 ingest contract) in their cells. Touched cells are read back
    * partition-pruned, arrivals replace same-id rows (re-ingest is an
    * UPDATE, not a duplicate), and dynamic partition overwrite
    * rewrites only the touched cells' directories — an arrival batch
    * touching 3 of 64 cells rewrites ~5% of the files and reads the
    * same. The touched slice is materialized through an eager local
    * checkpoint BEFORE the write so the job never reads the path it
    * is overwriting. */
  def upsert(spark: SparkSession, path: String, assigned: DataFrame): Unit = {
    val arrivals = assigned.select(col("vec_id"), col("embedding"),
      col("cell").cast(LongType).as("cell"))
    val touched = arrivals.select(col("cell")).distinct().collect()
      .map(_.getLong(0)).sorted.toSeq
    if (touched.isEmpty) return
    val existing = read(spark, path)
      .filter(col("cell").isin(touched: _*))
      .localCheckpoint(true)
    val merged = existing
      .join(broadcast(arrivals.select(col("vec_id"))), Seq("vec_id"), "left_anti")
      .unionByName(arrivals)
    val n = merged.sparkSession.sessionState.conf.numShufflePartitions
    merged.repartitionByRange(n, col("cell"), col("vec_id"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cell").parquet(path)
  }
}
