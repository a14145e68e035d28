package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Lineage hygiene for driver-side iterative loops (connected
  * components, BPE merge rounds): without a cut, every round's plan
  * nests the previous round's, so plan analysis / plan-string
  * generation grows per round and the job slows down and eventually
  * OOMs — long before the data itself is a problem at 100 TB.
  */
object Lineage {

  /** Truncate a frame's lineage to a materialized leaf. Eager: the
    * frame is computed once here and later reads hit block storage. */
  def cut(df: DataFrame): DataFrame = df.localCheckpoint()

  /** Release the block-storage copy behind a [[cut]] frame. The
    * checkpoint lives on the RDD inside the LogicalRDD leaf, which
    * CacheManager (and thus Dataset.unpersist) knows nothing about. */
  def release(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _              => () // not a checkpoint leaf — nothing pinned
    }
}
