package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the last stage
  * of the dedup pipeline: LSH candidate pairs form a graph whose
  * components are duplicate clusters, and each cluster keeps one
  * canonical document.
  *
  * Algorithm: iterative min-label propagation with pointer jumping.
  * Every vertex starts labeled with its own id; each round every
  * vertex takes the minimum of its own label and its neighbors'
  * labels, then shortcuts through its label's label (path halving —
  * labels are themselves vertex ids, so one self-join follows the
  * pointer chain two hops at a time). Neighbor propagation alone
  * converges in O(component diameter) rounds; the shortcut drops that
  * to O(log diameter) — a 1000-vertex chain labels in ~10 rounds, not
  * 1000. LSH dup clusters are near-cliques (diameter 2-3) where one
  * or two rounds suffice; the doubling is what makes adversarial
  * chain-shaped graphs safe under the same [[maxIters]] cap (hit it
  * and the algorithm logs and returns the partial labeling rather
  * than looping unbounded).
  *
  * Scale design (100 TB): the loop touches ONLY the edge list and the
  * vertices that appear in it — candidate pairs, a vanishing fraction
  * of the corpus; singleton documents never enter the iteration. Each
  * round is one shuffle keyed on vertex id (edges join labels, groupBy
  * min). `localCheckpoint` after each round truncates the lineage so
  * plan size stays constant across iterations instead of growing a
  * nested-join tree the optimizer re-analyzes every round.
  */
object ConnectedComponents {

  /** Component label per vertex: (id, lbl) where lbl is the minimum
    * vertex id reachable from `id`. Input edges are undirected pairs
    * in columns `srcCol`/`dstCol`; vertices not present in any edge
    * are absent from the output (they are their own singleton
    * component — callers coalesce). */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 20): DataFrame =
    runCounted(edges, srcCol, dstCol, maxIters)._1

  /** [[run]] plus the number of propagation rounds executed — the
    * observable the O(log d) pointer-jumping claim is probed on
    * (ScaleProbe cc mode; a chain graph labels in ~log₂(diameter)
    * rounds, not O(diameter)). */
  def runCounted(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 20): (DataFrame, Int) = {
    val sym = edges.select(col(srcCol).as("id"), col(dstCol).as("nbr"))
      .union(edges.select(col(dstCol).as("id"), col(srcCol).as("nbr")))
      .distinct()
      .localCheckpoint()

    var labels = sym.select(col("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint()
    // each round's localCheckpoint pins a fresh copy of the label set
    // in block storage; without explicit release up to maxIters copies
    // stay resident for the job's life. Dataset.unpersist() is a no-op
    // here (it only consults the CacheManager, not the checkpointed
    // RDD), so the superseded round's backing RDD is unpersisted
    // directly once the new round is materialized.
    var liveChk: DataFrame = labels
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      // min over each vertex's neighborhood labels, one keyed shuffle
      val nbrMin = sym
        .join(labels.select(col("id").as("nbr"), col("lbl").as("nlbl")), "nbr")
        .groupBy("id").agg(min(col("nlbl")).as("nmin"))
      val stepped = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("lbl").as("old"),
          least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
      // pointer jumping: follow lbl → lbl(lbl). The parent's label is
      // ≤ the parent id by construction, so the shortcut only lowers.
      // The pre-round label rides along as `old`, so the convergence
      // check below is a filter over the checkpointed round output —
      // not another join against the previous labels.
      val next = stepped
        .join(stepped.select(col("id").as("lbl"), col("lbl").as("plbl")),
          Seq("lbl"), "left")
        .select(col("id"), col("old"),
          coalesce(col("plbl"), col("lbl")).as("lbl"))
        .localCheckpoint()
      changed = next.filter(col("lbl") =!= col("old")).count()
      unpersistCheckpoint(liveChk) // next is materialized; prior round's blocks are dead
      liveChk = next
      labels = next.select(col("id"), col("lbl"))
      iter += 1
    }
    unpersistCheckpoint(sym) // the loop is over; the edge list is no longer needed
    if (changed > 0)
      System.err.println(
        s"[graft] connected components hit maxIters=$maxIters still changing " +
          s"($changed labels); returning partial labeling")
    (labels, iter)
  }

  private def unpersistCheckpoint(df: DataFrame): Unit = Lineage.release(df)
}
