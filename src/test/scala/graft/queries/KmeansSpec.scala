package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unsupervised IVF (Lloyd's k-means): deterministic across runs, and
  * an IVF probe over the learned cells recalls planted near-dups —
  * near-identical vectors land in the same cell, so probing one cell
  * finds the true neighbor without scanning the corpus. */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val perCluster = 60
  private val k = 4

  /** k well-separated Gaussian clusters; vector i's planted near-dup
    * is vector i + n (tiny noise, sim ≈ 0.99). */
  private def plantedCorpus() = {
    val rng = new scala.util.Random(7)
    val centers = Array.fill(k)(Array.fill(dim)(rng.nextGaussian() * 8.0))
    val base = (0 until k * perCluster).map { i =>
      val c = centers(i % k)
      c.map(_ + rng.nextGaussian() * 0.5)
    }
    val dups = base.map(_.map(_ + rng.nextGaussian() * 0.01))
    val n = base.size
    (base ++ dups).zipWithIndex.map { case (v, i) =>
      (i.toLong, v.map(_.toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("kmeans centroid rows are deterministic run-to-run") {
    val e = plantedCorpus()
    val a = VectorQueries.kmeansCentroidRowsOf(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = VectorQueries.kmeansCentroidRowsOf(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b)
    assert(a.nonEmpty)
    // every surviving cell has one component per dimension
    val cells = a.map(_._1)
    assert(cells.size >= 2, s"k-means collapsed to ${cells.size} cell(s)")
    cells.foreach { c => assert(a.count(_._1 == c) == dim) }
  }

  test("IVF probe over learned cells recalls planted near-dups") {
    val e = plantedCorpus()
    val n = k * perCluster
    val centers = VectorQueries.kmeansFit(e)
    val assigned = VectorQueries.kmeansAssign(e, centers)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // probe = scan only the query's cell: the planted near-dup is
    // recalled iff it shares the query's cell
    val recall = (0 until n).count(i =>
      assigned(i.toLong) == assigned((i + n).toLong)).toDouble / n
    // cells must partition the corpus (probe scans a fraction, not all)
    val byCell = assigned.values.groupBy(identity).view.mapValues(_.size)
    val largest = byCell.values.max.toDouble / (2 * n)
    info(f"planted near-dup recall: $recall%.3f, largest cell fraction: $largest%.3f")
    assert(recall >= 0.85, s"IVF probe missed planted near-dups: $recall")
    assert(largest <= 0.9, s"degenerate clustering: one cell holds $largest of corpus")
  }

  test("driver-local fit ≡ distributed fit, bit for bit (r15)") {
    // the local fast path must reproduce the distributed Lloyd EXACTLY
    // (centers become oracle literals); compare both coarse fit and
    // batched PQ codebooks with the fast path toggled off
    val e = plantedCorpus()
    def both[A](body: => A): (A, A) = {
      val fast = body
      spark.conf.set("spark.graft.fit.localEnabled", "false")
      try { (fast, body) }
      finally spark.conf.unset("spark.graft.fit.localEnabled")
    }
    val (cFast, cLoop) = both(VectorQueries.kmeansFit(e))
    assert(cFast.map(_._1) == cLoop.map(_._1))
    cFast.zip(cLoop).foreach { case ((_, a), (_, b)) =>
      assert(java.util.Arrays.equals(a, b)) }
    val (bFast, bLoop) = both(VectorQueries.pqCodebooks(e, dim, m = 4, k = 8))
    assert(bFast.size == bLoop.size)
    bFast.zip(bLoop).foreach { case (sa, sb) =>
      assert(sa.map(_._1) == sb.map(_._1))
      sa.zip(sb).foreach { case ((_, a), (_, b)) =>
        assert(java.util.Arrays.equals(a, b)) }
    }
  }

  test("fit sample overrunning the hard cap falls back to the distributed loop") {
    // ids crafted to ALL hash under any threshold can't be cheaply
    // simulated; instead force the corpus itself under target so the
    // 'sample is the corpus' branch collects — then the equivalence
    // above plus this toggle check covers both entry conditions
    val e = plantedCorpus().limit(40)
    val fast = VectorQueries.kmeansFit(e)
    spark.conf.set("spark.graft.fit.localEnabled", "false")
    val loop = try VectorQueries.kmeansFit(e)
      finally spark.conf.unset("spark.graft.fit.localEnabled")
    assert(fast.map(_._1) == loop.map(_._1))
    fast.zip(loop).foreach { case ((_, a), (_, b)) =>
      assert(java.util.Arrays.equals(a, b)) }
  }
}
