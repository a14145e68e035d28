package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Bucketing, Det, RowNumbers, Tables}
import graft.functions.TextFunctions._

/** Scaling probe: unions key-shifted copies of sf0.1 in-memory (~sf1:
  * 6M lineitem rows, 50k docs, 500k vectors at 10×) and times the
  * heaviest operator shapes, so "would this hold at 10×?" is measured,
  * not guessed. Results land in SCALE_r{N}.json. Run:
  *   sbt "runMain graft.ScaleProbe [copies] [outJson]"          — standard probes
  *   sbt "runMain graft.ScaleProbe factjoin [copies] [outJson]" — 100× fact-fact
  *     join, bucketed (Bucketing.scala) vs shuffle path head-to-head
  */
object ScaleProbe {
  private val dir = "/root/testdata/sf0.1"

  private def session(): SparkSession = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // serving's bounded top-k heaps must stay hash-aggregated at
      // batch-cap group counts (see GraftSession)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "200000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  private def scaled(spark: SparkSession, name: String, keyCols: Seq[String],
      copies: Int): DataFrame = {
    val base = Tables(spark, dir, name)
    val shift = 10000000L
    (0 until copies).map { i =>
      keyCols.foldLeft(base)((df, k) =>
        df.withColumn(k, col(k) + lit(i * shift)))
    }.reduce(_ unionAll _)
  }

  private val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
  // per-leg stage/task-time accounting (attached by abGuard): separates
  // real compute from scheduler/barrier latency when reading A/Bs
  private val stageCount = new java.util.concurrent.atomic.AtomicInteger(0)
  private val taskMs = new java.util.concurrent.atomic.AtomicLong(0)
  private def time(label: String)(f: => Unit): Unit = {
    val s0 = stageCount.get; val m0 = taskMs.get
    val t0 = System.nanoTime()
    f
    val sec = (System.nanoTime() - t0) / 1e9
    results(label) = math.rint(sec * 100) / 100
    // task-time accounting only exists when a mode attached the stage
    // listener (abGuard) — record it next to the wall time so the JSON
    // carries the compute-vs-stage-latency split, not just the print
    val tsec = (taskMs.get - m0) / 1e3
    if (tsec > 0) results(label + "_tasksec") = math.rint(tsec * 100) / 100
    println(f"$label%-28s $sec%8.2f s  stages=${stageCount.get - s0}%3d taskSec=$tsec%8.2f")
  }

  private def writeJson(outJson: Option[String], copies: Int,
      extra: String = ""): Unit =
    outJson.foreach { p =>
      val probes = results.map { case (k, v) => s""""$k": $v""" }.mkString(", ")
      val json =
        s"""{"copies": $copies, "sf_base": 0.1, "probes": {$probes}$extra}"""
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n")
      println(s"wrote $p")
    }

  def main(args: Array[String]): Unit =
    if (args.headOption.contains("factjoin")) factJoin(args.drop(1))
    else if (args.headOption.contains("abguard")) abGuard(args.drop(1))
    else if (args.headOption.contains("cc")) ccProbe(args.drop(1))
    else if (args.headOption.contains("r4ops")) r4Ops(args.drop(1))
    else if (args.headOption.contains("newops")) newOps(args.drop(1))
    else if (args.headOption.contains("shingleab")) shingleAb(args.drop(1))
    else if (args.headOption.contains("incdedup")) incDedup(args.drop(1))
    else if (args.headOption.contains("classifier")) classifierProbe(args.drop(1))
    else if (args.headOption.contains("lsheval")) lshEvalProbe(args.drop(1))
    else if (args.headOption.contains("linerep")) lineRepProbe(args.drop(1))
    else if (args.headOption.contains("r6ops")) r6Ops(args.drop(1))
    else if (args.headOption.contains("r5new")) r5New(args.drop(1))
    else if (args.headOption.contains("r6fix")) r6Fix(args.drop(1))
    else if (args.headOption.contains("r6new")) r6New(args.drop(1))
    else if (args.headOption.contains("r7ops")) r7Ops(args.drop(1))
    else if (args.headOption.contains("r8new")) r8New(args.drop(1))
    else if (args.headOption.contains("fitsample")) fitSampleProbe(args.drop(1))
    else if (args.headOption.contains("r10new")) r10New(args.drop(1))
    else if (args.headOption.contains("r11new")) r11New(args.drop(1))
    else if (args.headOption.contains("r12new")) r12New(args.drop(1))
    else if (args.headOption.contains("r12pq")) r12Pq(args.drop(1))
    else if (args.headOption.contains("r13pq")) r13Pq(args.drop(1))
    else if (args.headOption.contains("r14pq")) r14Pq(args.drop(1))
    else if (args.headOption.contains("r15churn")) r15Churn(args.drop(1))
    else if (args.headOption.contains("r15cap")) r15Cap(args.drop(1))
    else if (args.headOption.contains("r15waves")) r15Waves(args.drop(1))
    else if (args.headOption.contains("r15lut")) r15Lut(args.drop(1))
    else if (args.headOption.contains("r14cap")) r14Cap(args.drop(1))
    else if (args.headOption.contains("r14sidecar")) r14Sidecar(args.drop(1))
    else if (args.headOption.contains("r14flip")) r14Flip(args.drop(1))
    else if (args.headOption.contains("r14diag")) r14Diag(args.drop(1))
    else if (args.headOption.contains("r13diag")) r13Diag(args.drop(1))
    else if (args.headOption.contains("r13cap")) r13Cap(args.drop(1))
    else if (args.headOption.contains("r13compact")) r13Compact(args.drop(1))
    else if (args.headOption.contains("r11p13")) r11P13(args.drop(1))
    else if (args.headOption.contains("r11skew")) r11Skew(args.drop(1))
    else if (args.headOption.contains("r9new")) r9New(args.drop(1))
    else if (args.headOption.contains("r9late")) r9Late(args.drop(1))
    else if (args.headOption.contains("r7new")) r7New(args.drop(1))
    else if (args.headOption.contains("r7layout")) r7Layout(args.drop(1))
    else if (args.headOption.contains("skewjoin")) skewJoin(args.drop(1))
    else if (args.headOption.contains("p05x")) p05Composition(args.drop(1))
    else standard(args)

  /** Round-10 probe (r9 verdict #1): sample-bounded codebook training.
    * Every Lloyd fit now trains on a deterministic ≤256·k-row hash
    * sample, so fit wall-clock must stay ~FLAT as the corpus grows
    * 10×→100× while the single encode pass grows linearly — run with
    * copies 10 and 100 and compare `fit_*` (flat) vs `encode_pq_full`
    * (linear). v33 end-to-end shows the serving path's new floor. */
  private def fitSampleProbe(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.drop(1).headOption
    val spark = session()
    import graft.queries.VectorQueries
    // materialize the scaled corpus as parquet and read THAT: each
    // training pass then costs a real scan (the 100 TB shape) instead
    // of a hot in-memory union, and the corpus count is parquet
    // metadata — exactly what fitSample's threshold pass costs in
    // production
    val tmp = "/tmp/graft_fitsample"
    scaled(spark, "embeddings", Seq("vec_id"), copies)
      .select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val e = spark.read.parquet(s"$tmp/embeddings.parquet")
    println(s"copies=$copies vecs=${e.count()}")
    time("fit_coarse_k4")(VectorQueries.kmeansFit(e, 4, 2))
    // A/B: the SAME Lloyd loop driven over the full corpus (the r9
    // behavior) — the gap is what sample-bounding buys per fit
    val seeds = VectorQueries.kmeansFit(e, 4, 0) // 0 iters = seeds only
    time("fit_coarse_k4_fullcorpus")(VectorQueries.kmeansFitFrom(e, seeds, 2))
    time("fit_pq_8x16") {
      val n = e.count()
      (0 until 8).foreach { s =>
        VectorQueries.kmeansFit(e.select(col("vec_id"),
          slice(col("embedding"), s * 8 + 1, 8).as("embedding")), 16, 2, n)
      }
    }
    time("encode_pq_full")(VectorQueries.pqCodes(e, 64)
      .write.format("noop").mode("overwrite").save())
    time("v33_end_to_end")(VectorQueries.ivfPqRerank(e, 20, 5)
      .write.format("noop").mode("overwrite").save())
    writeJson(outJson, copies)
    spark.stop()
  }

  /** Round-11 probe (VERDICT r10 #1's done-criteria): the persisted-
    * index lifecycle at copies×. The corpus is materialized to
    * parquet and indexed cell-partitioned once; then
    *  - `index_build` = the REBUILD reference cost (fit + one full
    *    assignment/write pass);
    *  - `refresh_means` = one scan OF THE INDEX into k·d doubles;
    *  - `repair_indexed_dirty{0,1,2,4}` = the partition-pruned
    *    re-score with a CONTROLLED dirty set (d of k=4 cells
    *    perturbed past the threshold) — wall must TRACK the dirty
    *    fraction (d=0 reads nothing, d=4 reads everything) and the
    *    full-dirty ceiling must beat the r10 in-memory repair;
    *  - `repair_inmem_lifecycle` = the r10 shape (fit + persisted
    *    assignment + re-score) for the same corpus, the A/B;
    *  - `upsert_0p1pct` = landing a ~0.1% arrival batch with dynamic
    *    partition overwrite — must cost a small fraction of
    *    `index_build`, since only touched cells rewrite. */
  /** Round-12 probe (VERDICT r11 #1/#2 done-criteria): the `_centers`
    * sidecar and the append ingest path at scale. Run at two corpus
    * sizes (e.g. copies 100 and 1000) and compare:
    *  - `route_sidecar_*` = serve-batch routing off the sidecar (k·d
    *    driver doubles) — must stay FLAT (ms) as the index grows,
    *    while `route_fullscan_r11` (the old per-call VecMeanAgg over
    *    the whole index) grows linearly;
    *  - `serve_q100_top10[_probe2]` = the real dialect statement over
    *    a 100-query external batch — wall should track the probed
    *    cells' occupancy (the pruned gather), not the index size,
    *    now that routing is index-scan-free;
    *  - `append_0p1pct_scattered` vs `upsert_0p1pct_scattered` = the
    *    same uniform 0.1% arrival batch through both ingest paths,
    *    with the BYTES each writes (walk of cell= files) — append
    *    must write O(batch), the overwrite upsert O(touched cells'
    *    occupancy);
    *  - `compact_after_appends` = restoring plain-read exactness
    *    after re-ingest appends created superseded copies. */
  private def r12New(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.drop(1).headOption
    val spark = session()
    import graft.queries.VectorQueries
    import graft.operators.IvfIndex
    val tmp = s"/tmp/graft_r12_probe_$copies"
    scaled(spark, "embeddings", Seq("vec_id"), copies)
      .select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$tmp/emb.parquet")
    val e = spark.read.parquet(s"$tmp/emb.parquet")
    println(s"copies=$copies vecs=${e.count()}")
    val idxPath = s"$tmp/idx"
    val K = 64
    var centers: Seq[(Int, Array[Double])] = Seq.empty
    time("index_build") { centers = IvfIndex.build(e, idxPath, K) }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // bytes WRITTEN by an op = total size of files that did not exist
    // before it (a net-size delta would hide rewrites: the overwrite
    // upsert replaces a touched cell's files with similar-sized ones)
    def cellFiles(p: String): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(p)).iterator().asScala
        .filter(f => f.toString.contains("cell=") && f.toString.endsWith(".parquet"))
        .map(f => f.toString -> java.nio.file.Files.size(f)).toMap
    }
    def writtenMb(before: Map[String, Long], p: String): Double = {
      val after = cellFiles(p)
      math.rint((after -- before.keySet).values.sum / 1e4) / 100
    }
    // 1) routing: sidecar (cold + cached) vs the r11 full-index agg
    time("route_sidecar_cold") {
      IvfIndex.SidecarCache.invalidate(idxPath)
      require(IvfIndex.SidecarCache.get(spark, idxPath).isDefined)
    }
    time("route_sidecar_cached") {
      require(IvfIndex.SidecarCache.get(spark, idxPath).isDefined)
    }
    time("route_fullscan_r11") {
      VectorQueries.refreshedCenters(IvfIndex.read(spark, idxPath))
    }
    // 2) the real serve statement over a 100-query external batch
    val g = graft.sql.GraftSession(spark, tmp)
    val qPath = s"$tmp/qbatch.parquet"
    e.orderBy(col("vec_id")).limit(100)
      .select((col("vec_id") + lit(970000000000L)).as("vec_id"),
        col("embedding"))
      .coalesce(1).write.mode("overwrite").parquet(qPath)
    time("serve_q100_top10")(noop(g.sql(
      s"serve vec_id, embedding from '$idxPath' query '$qPath' top 10")))
    time("serve_q100_top10_probe2")(noop(g.sql(
      s"serve vec_id, embedding from '$idxPath' query '$qPath' top 10 probe 2")))
    // 3) the same scattered ~0.1% batch through BOTH ingest paths
    val scattered = e.filter(pmod(col("vec_id"), lit(1024L)) === 7L)
      .select((col("vec_id") + lit(950000000000L)).as("vec_id"),
        col("embedding")).localCheckpoint(true)
    println(s"arrivals_scattered=${scattered.count()}")
    val assignedA = VectorQueries.kmeansAssign(scattered, centers)
    val f0 = cellFiles(idxPath)
    time("append_0p1pct_scattered")(IvfIndex.append(spark, idxPath, assignedA))
    results("append_written_mb") = writtenMb(f0, idxPath)
    // re-ingest appends (same ids again) create superseded copies —
    // what compact exists to clean up
    time("append_reingest")(IvfIndex.append(spark, idxPath,
      VectorQueries.kmeansAssign(scattered, centers)))
    time("readlatest_full")(noop(IvfIndex.readLatest(spark, idxPath)))
    val f1 = cellFiles(idxPath)
    time("compact_after_appends") {
      println(s"compacted_cells=${IvfIndex.compact(spark, idxPath).size}")
    }
    results("compact_written_mb") = writtenMb(f1, idxPath)
    // the overwrite path on the now-compacted index, same batch shape
    val scattered2 = e.filter(pmod(col("vec_id"), lit(1024L)) === 9L)
      .select((col("vec_id") + lit(960000000000L)).as("vec_id"),
        col("embedding")).localCheckpoint(true)
    val assignedB = VectorQueries.kmeansAssign(scattered2, centers)
    val f2 = cellFiles(idxPath)
    time("upsert_0p1pct_scattered")(IvfIndex.upsert(spark, idxPath, assignedB))
    results("upsert_written_mb") = writtenMb(f2, idxPath)
    results("index_total_mb") = math.rint(cellFiles(idxPath).values.sum / 1e4) / 100
    writeJson(outJson, copies)
    spark.stop()
  }

  /** Round-12 PQ-serving probe: exact vs ADC serving off the same
    * persisted index. Records, at each corpus size:
    *  - `build_pq` vs `build_plain` — the extra cost of training the
    *    codebooks and storing ~8 bytes of codes per row;
    *  - `serve_exact_q100` vs `serve_pq_q100` — the same 100-query
    *    batch answered by the full-float gather vs the codes-only ADC
    *    shortlist + winner re-rank;
    *  - `pq_overlap_at10` — fraction of the exact top-10 the PQ path
    *    recovers (the recall price of the scan-byte cut). */
  private def r12Pq(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.drop(1).headOption
    val spark = session()
    import graft.queries.VectorQueries
    import graft.operators.IvfIndex
    // input-bytes accounting: the PQ win is a SCAN-BYTE cut (codes vs
    // floats), which local walls can hide when the float column
    // compresses well — record bytes read per serving leg directly
    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          bytesRead.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.bytesRead)
      })
    // listener events are ASYNC — drain until the counter settles so
    // one leg's bytes never land in the next leg's delta
    def drained(): Long = {
      var prev = -1L
      while (bytesRead.get != prev) { prev = bytesRead.get; Thread.sleep(250) }
      prev
    }
    def readMb(label: String)(f: => Unit): Unit = {
      val b0 = drained()
      f
      results(label + "_readmb") = math.rint((drained() - b0) / 1e4) / 100
    }
    val tmp = s"/tmp/graft_r12pq_probe_$copies"
    scaled(spark, "embeddings", Seq("vec_id"), copies)
      .select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$tmp/emb.parquet")
    val e = spark.read.parquet(s"$tmp/emb.parquet")
    println(s"copies=$copies vecs=${e.count()}")
    val K = 64
    val plainPath = s"$tmp/idx_plain"
    val pqPath = s"$tmp/idx_pq"
    time("build_plain")(IvfIndex.build(e, plainPath, K))
    time("build_pq")(IvfIndex.build(e, pqPath, K, pq = true))
    val side = IvfIndex.readSidecar(spark, pqPath).get
    val q = e.orderBy(col("vec_id")).limit(100)
      .select((col("vec_id") + lit(970000000000L)).as("q_id"),
        col("embedding").as("q_emb")).localCheckpoint(true)
    val panel = q.select(col("q_id"), col("q_emb"),
      graft.functions.VectorExprs.nearest_centroid(
        col("q_emb"), side.refresh, side.dim).as("cell"))
      .localCheckpoint(true)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val idxPq = IvfIndex.readFull(spark, pqPath)
    readMb("serve_exact_q100")(time("serve_exact_q100")(noop(IvfIndex.serve(
      IvfIndex.read(spark, pqPath), panel, 10))))
    readMb("serve_pq_q100")(time("serve_pq_q100")(noop(IvfIndex.servePq(
      idxPq, q, panel, 10, 50, side.serving, side.books))))
    // recall of the ADC path against the exact gather on the SAME index
    val exact = IvfIndex.serve(IvfIndex.read(spark, pqPath), panel, 10)
      .select(col("q_id"), col("n_id")).collect()
      .groupBy(_.getLong(0)).map { case (k2, v) => k2 -> v.map(_.getLong(1)).toSet }
    val pq = IvfIndex.servePq(idxPq, q, panel, 10, 50, side.serving, side.books)
      .select(col("q_id"), col("n_id")).collect()
      .groupBy(_.getLong(0)).map { case (k2, v) => k2 -> v.map(_.getLong(1)).toSet }
    val overlap = exact.map { case (qid, t) =>
      pq.get(qid).map(p => (p & t).size.toDouble / t.size).getOrElse(0.0)
    }.sum / exact.size
    results("pq_overlap_at10") = math.rint(overlap * 1000) / 1000
    writeJson(outJson, copies)
    spark.stop()
  }

  /** Round-13 PQ probe on a REAL-ENTROPY fixture (VERDICT r12 #2): the
    * sf fixture's duplicated floats dictionary-compress to ~0, so the
    * 8 B-codes-vs-256 B-floats claim had no measured demonstration.
    * This probe generates `copies`·2000 vectors of 64 seeded
    * rand() floats — incompressible, like real model embeddings — and
    * records, per serving path, the BYTES READ (the number that
    * matters at 100 TB):
    *  - `serve_exact_q100_readmb` = the full-float pruned gather;
    *  - `serve_pq_q100_readmb` = codes-only ADC shortlist + the
    *    PUSHED-ids re-rank gather (r13 #1) — must be strictly below
    *    exact, ≈ code-scan + shortlist·row-size;
    *  - `pq_index_mb` vs `plain_index_mb` and the per-column split;
    *  - the probe×shortlist recall sweep (r13 #6): `recall_p{P}_s{S}`
    *    = overlap@10 of the PQ path against exact serving at the SAME
    *    probe, isolating the ADC loss from the cell-boundary loss. */
  private def r13Pq(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.drop(1).headOption
    val spark = session()
    import graft.operators.IvfIndex
    // byte accounting via /proc/self/io rchar — OS-level ground truth
    // for every read syscall this JVM makes (local mode: all tasks).
    // Neither the Spark listener metrics nor Hadoop's FileSystem
    // statistics see the vectorized parquet reader's bytes (the
    // calibration leg proved it: a full 52 MB column scan registered
    // 0.46 MB — just the driver's footer reads), so both silently
    // report routing/footer traffic as if it were the scan. rchar
    // includes shuffle-file and jar reads as noise, which the
    // calibration leg bounds.
    def rcharBytes(): Long =
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get("/proc/self/io"))
        .stream().filter(_.startsWith("rchar:"))
        .findFirst().map[Long](l => l.split(":\\s*")(1).trim.toLong).orElse(0L)
    def readMb(label: String)(f: => Unit): Unit = {
      val b0 = rcharBytes()
      f
      results(label + "_readmb") = math.rint((rcharBytes() - b0) / 1e4) / 100
    }
    val n = copies * 2000L
    val tmp = s"/tmp/graft_r13pq_probe_$copies"
    // real-entropy embeddings with REAL STRUCTURE: n/10 deterministic
    // ~10-member clusters (assigned by id HASH, so true neighbors get
    // no artificial vec_id locality) plus per-row uniform noise. Every
    // float is unique — nothing for parquet's dictionary/RLE to
    // exploit, so file bytes reflect the true ~256 B/row payload the
    // way a real embedding column's would — and each vector's true
    // top-10 is its own cluster's members, DISTINCTLY closer than the
    // bulk (like real near-neighbors; pure iid noise would make top-10
    // unrankable ties). Cluster centers are BLOCK-STRUCTURED: per
    // 8-dim PQ block each cluster draws one of 16 sin-hash patterns —
    // i.e. the fixture is quantizable at the index's configured 8×16
    // rate, the regime real embeddings are in when the PQ config is
    // sized to the data (32 bits of iid-random offsets per cell would
    // sit far above any 32-bit code's rate-distortion floor and
    // demonstrate only that misconfigured PQ is lossy).
    val dim = 64
    val blockCols = (0 until 8).map(b =>
      pmod(hash(col("cl"), lit(b)), lit(16)).cast("double").as(s"p$b"))
    spark.range(n).select(col("id").as("vec_id"),
        pmod(hash(col("id")), lit(math.max(1L, n / 10L))).as("cl"))
      .select(col("vec_id") +: blockCols: _*)
      .select(col("vec_id"),
        array((0 until dim).map(i =>
          (sin(col(s"p${i / 8}") * lit(2.17) + lit(i * 1.73)) +
            (rand(42L + i) - lit(0.5)) * lit(0.3)).cast("float")): _*)
          .as("embedding"))
      .write.mode("overwrite").parquet(s"$tmp/emb.parquet")
    val e = spark.read.parquet(s"$tmp/emb.parquet")
    println(s"copies=$copies vecs=${e.count()}")
    val K = 64
    val plainPath = s"$tmp/idx_plain"
    val pqPath = s"$tmp/idx_pq"
    time("build_plain")(IvfIndex.build(e, plainPath, K))
    time("build_pq")(IvfIndex.build(e, pqPath, K, pq = true))
    def dirMb(p: String): Double = {
      import scala.jdk.CollectionConverters._
      math.rint(java.nio.file.Files.walk(java.nio.file.Paths.get(p))
        .iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .map(java.nio.file.Files.size).sum / 1e4) / 100
    }
    results("plain_index_mb") = dirMb(plainPath)
    results("pq_index_mb") = dirMb(pqPath)
    results("pq_code_mb_nominal") = math.rint(n * 8 / 1e4) / 100
    val side = IvfIndex.readSidecar(spark, pqPath).get
    val q = e.filter(col("vec_id") < 100)
      .select((col("vec_id") + lit(970000000000L)).as("q_id"),
        col("embedding").as("q_emb")).localCheckpoint(true)
    def panelOf(probe: Int) =
      if (probe <= 1)
        q.select(col("q_id"), col("q_emb"),
          graft.functions.VectorExprs.nearest_centroid(
            col("q_emb"), side.refresh, side.dim).as("cell"))
          .localCheckpoint(true)
      else
        q.select(col("q_id"), col("q_emb"),
          explode(graft.functions.VectorExprs.nearest_cells(
            col("q_emb"), side.refresh, side.dim, probe)).as("cell"))
          .localCheckpoint(true)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val idxPq = IvfIndex.readFull(spark, pqPath)
    // accounting calibration: a forced full read of the embedding
    // column must report ≈ the index's float payload, or the
    // per-leg read-MB numbers can't be trusted
    readMb("calibration_full_scan")(
      IvfIndex.read(spark, pqPath)
        .agg(sum(element_at(col("embedding"), 1))).collect())
    val panel1 = panelOf(1)
    val probed1 = panel1.select(col("cell")).distinct().collect()
      .map(_.getLong(0)).sorted.toSeq
    results("probed_cells_q100") = probed1.size.toDouble
    results("probed_rows_q100") = IvfIndex.read(spark, pqPath)
      .filter(col("cell").isin(probed1: _*)).count().toDouble
    readMb("serve_exact_q100")(time("serve_exact_q100")(noop(IvfIndex.serve(
      IvfIndex.read(spark, pqPath), panel1, 10))))
    readMb("serve_pq_q100")(time("serve_pq_q100")(noop(IvfIndex.servePq(
      idxPq, q, panel1, 10, 50, side.serving, side.books))))
    // the scan-byte geometry: the pushed gather reads
    // min(winners, pages)·page-bytes, so the PQ byte cut needs probed
    // rows ≫ q·shortlist (true for any production cell size; inverted
    // when a 100-query×50 shortlist rivals the probed cells' page
    // count). The q10 leg records the ratio at a geometry the local
    // fixture CAN express; the q100 leg above records the cap-shaped
    // batch honestly even where page skipping can't help it.
    val q10 = q.filter(col("q_id") < lit(970000000010L)).localCheckpoint(true)
    val panel10 = q10.select(col("q_id"), col("q_emb"),
      graft.functions.VectorExprs.nearest_centroid(
        col("q_emb"), side.refresh, side.dim).as("cell")).localCheckpoint(true)
    readMb("serve_exact_q10")(time("serve_exact_q10")(noop(IvfIndex.serve(
      IvfIndex.read(spark, pqPath), panel10, 10))))
    readMb("serve_pq_q10")(time("serve_pq_q10")(noop(IvfIndex.servePq(
      idxPq, q10, panel10, 10, 20, side.serving, side.books))))
    // recall sweep: PQ vs exact at the SAME probe — the ADC loss alone
    for (probe <- Seq(1, 2, 4)) {
      val panel = panelOf(probe)
      val exact = IvfIndex.serve(IvfIndex.read(spark, pqPath), panel, 10)
        .select(col("q_id"), col("n_id")).collect()
        .groupBy(_.getLong(0)).map { case (k2, v) => k2 -> v.map(_.getLong(1)).toSet }
      for (shortlist <- Seq(25, 50, 100)) {
        val pq = IvfIndex.servePq(idxPq, q, panel, 10, shortlist,
            side.serving, side.books)
          .select(col("q_id"), col("n_id")).collect()
          .groupBy(_.getLong(0)).map { case (k2, v) => k2 -> v.map(_.getLong(1)).toSet }
        val overlap = exact.map { case (qid, t) =>
          pq.get(qid).map(p => (p & t).size.toDouble / t.size).getOrElse(0.0)
        }.sum / exact.size
        results(s"recall_p${probe}_s$shortlist") = math.rint(overlap * 1000) / 1000
        println(f"recall probe=$probe shortlist=$shortlist -> $overlap%.3f")
      }
    }
    writeJson(outJson, copies)
    spark.stop()
  }

  /** rchar off /proc/self/io — OS-level ground truth for every read
    * syscall this JVM makes (local mode: all tasks); see r13Pq for the
    * calibration story. */
  private def rchar(): Long =
    java.nio.file.Files.readAllLines(java.nio.file.Paths.get("/proc/self/io"))
      .stream().filter(_.startsWith("rchar:"))
      .findFirst().map[Long](l => l.split(":\\s*")(1).trim.toLong).orElse(0L)

  /** The r13pq block-structured real-entropy fixture (see r13Pq for
    * the full rationale): n/10 hash-assigned clusters, per-8-dim-block
    * centers drawn from 16 sin patterns (quantizable at the index's
    * 8×16 rate), per-row uniform noise, every float unique. */
  private def blockClusterEmbeddings(spark: SparkSession, n: Long,
      path: String): DataFrame = {
    val dim = 64
    val blockCols = (0 until 8).map(b =>
      pmod(hash(col("cl"), lit(b)), lit(16)).cast("double").as(s"p$b"))
    spark.range(n).select(col("id").as("vec_id"),
        pmod(hash(col("id")), lit(math.max(1L, n / 10L))).as("cl"))
      .select(col("vec_id") +: blockCols: _*)
      .select(col("vec_id"),
        array((0 until dim).map(i =>
          (sin(col(s"p${i / 8}") * lit(2.17) + lit(i * 1.73)) +
            (rand(42L + i) - lit(0.5)) * lit(0.3)).cast("float")): _*)
          .as("embedding"))
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** Round-14 gather probe (VERDICT r13 ask #1): the wave-chunked
    * pushed gather must extend the PQ byte win past the old 1024-id
    * push ceiling — serve_pq READ-BYTES strictly below exact at q100
    * (r13 recorded 434.9 vs 414.6 MB there: the fallback re-read every
    * probed cell's embeddings on top of the code scan), with the
    * per-wave construction wall recorded, PLUS recall@10 against
    * BRUTE-FORCE TRUTH per probe×shortlist (ask #5 — the r13 sweep
    * measured overlap vs exact-at-same-probe, isolating ADC loss; the
    * user-facing number also charges the cell-boundary loss). */
  private def r14Pq(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(1000)
    val outJson = args.drop(1).headOption
    val spark = session()
    import graft.operators.IvfIndex
    def readMb(label: String)(f: => Unit): Unit = {
      val b0 = rchar()
      f
      results(label + "_readmb") = math.rint((rchar() - b0) / 1e4) / 100
    }
    val n = copies * 2000L
    val tmp = s"/tmp/graft_r14pq_probe_$copies"
    val e = blockClusterEmbeddings(spark, n, s"$tmp/emb.parquet")
    println(s"copies=$copies vecs=${e.count()}")
    val K = 64
    val pqPath = s"$tmp/idx_pq"
    time("build_pq")(IvfIndex.build(e, pqPath, K, pq = true))
    val side = IvfIndex.readSidecar(spark, pqPath).get
    val q = e.filter(col("vec_id") < 100)
      .select((col("vec_id") + lit(970000000000L)).as("q_id"),
        col("embedding").as("q_emb")).localCheckpoint(true)
    def panelOf(qdf: DataFrame, probe: Int) =
      if (probe <= 1)
        qdf.select(col("q_id"), col("q_emb"),
          graft.functions.VectorExprs.nearest_centroid(
            col("q_emb"), side.refresh, side.dim).as("cell"))
          .localCheckpoint(true)
      else
        qdf.select(col("q_id"), col("q_emb"),
          explode(graft.functions.VectorExprs.nearest_cells(
            col("q_emb"), side.refresh, side.dim, probe)).as("cell"))
          .localCheckpoint(true)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val idxPq = IvfIndex.readFull(spark, pqPath)
    readMb("calibration_full_scan")(
      IvfIndex.read(spark, pqPath)
        .agg(sum(element_at(col("embedding"), 1))).collect())
    val panel1 = panelOf(q, 1)
    // q100: the geometry the r13 fallback LOST (≈3-5k distinct winner
    // ids — past one plan's term budget, far under the probed pages).
    // The wave-chunked gather runs during servePq construction (eager
    // per-wave checkpoints), so construction wall is recorded
    // separately from the drain — the "per-wave planning stays
    // bounded" evidence.
    readMb("serve_exact_q100")(time("serve_exact_q100")(noop(IvfIndex.serve(
      IvfIndex.read(spark, pqPath), panel1, 10))))
    readMb("serve_pq_q100")(time("serve_pq_q100") {
      var served: DataFrame = null
      time("serve_pq_q100_construct") {
        served = IvfIndex.servePq(idxPq, q, panel1, 10, 50,
          side.serving, side.books, cellRows = side.counts)
      }
      noop(served)
    })
    // q10: the latency path (same as r13 — must not regress)
    val q10 = q.filter(col("q_id") < lit(970000000010L)).localCheckpoint(true)
    val panel10 = panelOf(q10, 1)
    readMb("serve_exact_q10")(time("serve_exact_q10")(noop(IvfIndex.serve(
      IvfIndex.read(spark, pqPath), panel10, 10))))
    readMb("serve_pq_q10")(time("serve_pq_q10")(noop(IvfIndex.servePq(
      idxPq, q10, panel10, 10, 20, side.serving, side.books,
      cellRows = side.counts))))
    // brute-force truth for the 100 queries: exact cosine over the
    // WHOLE corpus (no cell routing), top 10 — the user-facing recall
    // denominator that charges cell-boundary loss too
    // truth ranks over the SAME candidate universe serving sees: the
    // q_ids are shifted out of the corpus id space, so serve's
    // q_id =!= n_id self-filter never fires and the query's own corpus
    // row is a legitimate (rank-1) neighbor — excluding it from truth
    // but not from the served sets would cap measured recall at 0.9
    val truth = e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      .join(broadcast(q))
      .select(col("q_id"), col("n_id"),
        graft.queries.VectorQueries.cosine(col("q_emb"), col("n_emb")).as("sim"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("n_id").asc)))
      .filter(col("rank") <= 10)
      .select(col("q_id"), col("n_id")).collect()
      .groupBy(_.getLong(0)).map { case (k2, v) => k2 -> v.map(_.getLong(1)).toSet }
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double = {
      val got = rows.groupBy(_.getLong(0))
        .map { case (k2, v) => k2 -> v.map(_.getLong(1)).toSet }
      truth.map { case (qid, t) =>
        got.get(qid).map(p => (p & t).size.toDouble / t.size).getOrElse(0.0)
      }.sum / truth.size
    }
    for (probe <- Seq(1, 2, 4)) {
      val panel = panelOf(q, probe)
      val exact = recallOf(IvfIndex.serve(IvfIndex.read(spark, pqPath), panel, 10)
        .select(col("q_id"), col("n_id")).collect())
      results(s"recall_truth_exact_p$probe") = math.rint(exact * 1000) / 1000
      println(f"recall-vs-truth probe=$probe exact -> $exact%.3f")
      for (shortlist <- Seq(25, 50, 100)) {
        val r = recallOf(IvfIndex.servePq(idxPq, q, panel, 10, shortlist,
            side.serving, side.books, cellRows = side.counts)
          .select(col("q_id"), col("n_id")).collect())
        results(s"recall_truth_pq_p${probe}_s$shortlist") = math.rint(r * 1000) / 1000
        println(f"recall-vs-truth probe=$probe shortlist=$shortlist -> $r%.3f")
      }
    }
    writeJson(outJson, copies)
    spark.stop()
  }

  /** Round-14 cap probe (VERDICT r13 ask #1, cap leg): the 100k-query
    * cap batch against the 2M-vector index, rchar-accounted, in TWO
    * workloads:
    *  - `uniform`: 100k distinct query points — their 50-shortlists
    *    cover essentially every page of the probed corpus, so NO
    *    gather can read fewer bytes than one full embedding pass; the
    *    physics floor is gather ≈ exact and pq_total ≈ exact + the ~2%
    *    code scan. The probe records the achieved parity ratio (r13's
    *    fallback had no flip and re-read everything ON TOP of codes —
    *    same floor, but the design now reaches it by CHOICE per cell).
    *  - `hot`: 100 distinct points × 1000 near-duplicate queries each
    *    (the skewed traffic a real serving tier sees at the cap) —
    *    distinct winners collapse to ~5k ids and the wave-chunked
    *    pushed gather must beat exact outright.
    * Both workloads assert nothing; the JSON records the honest
    * numbers for the verdict. */
  private def r14Cap(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(1000)
    val outJson = args.drop(1).headOption
    val spark = session()
    import graft.operators.IvfIndex
    def readMb(label: String)(f: => Unit): Unit = {
      val b0 = rchar()
      f
      results(label + "_readmb") = math.rint((rchar() - b0) / 1e4) / 100
    }
    val n = copies * 2000L
    val tmp = s"/tmp/graft_r14pq_probe_$copies" // shared with r14pq
    val embPath = s"$tmp/emb.parquet"
    val pqPath = s"$tmp/idx_pq"
    val e =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(embPath)))
        spark.read.parquet(embPath)
      else blockClusterEmbeddings(spark, n, embPath)
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(pqPath,
        IvfIndex.SidecarDir)))
      time("build_pq")(IvfIndex.build(e, pqPath, 64, pq = true))
    val side = IvfIndex.readSidecar(spark, pqPath).get
    val idxPq = IvfIndex.readFull(spark, pqPath)
    val capQ = 100000L
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    readMb("calibration_full_scan")(
      IvfIndex.read(spark, pqPath)
        .agg(sum(element_at(col("embedding"), 1))).collect())
    // uniform: 100k distinct corpus points as queries (shifted ids)
    val qUniform = e.filter(col("vec_id") < capQ)
      .select((col("vec_id") + lit(970000000000L)).as("q_id"),
        col("embedding").as("q_emb")).localCheckpoint(true)
    // hot: 100 distinct points, each asked 1000× under unique q_ids
    val hotBase = e.filter(col("vec_id") < 100)
      .select(col("vec_id"), col("embedding"))
    val qHot = hotBase.join(broadcast(spark.range(1000).select(col("id").as("rep"))))
      .select((col("vec_id") * 1000L + col("rep") + lit(970000000000L)).as("q_id"),
        col("embedding").as("q_emb")).localCheckpoint(true)
    def panelOf(qdf: DataFrame) = qdf.select(col("q_id"), col("q_emb"),
      graft.functions.VectorExprs.nearest_centroid(
        col("q_emb"), side.refresh, side.dim).as("cell")).localCheckpoint(true)
    for ((name, qdf) <- Seq("uniform" -> qUniform, "hot" -> qHot)) {
      val panel = panelOf(qdf)
      readMb(s"serve_exact_${name}_q100k")(time(s"serve_exact_${name}_q100k")(
        noop(IvfIndex.serve(IvfIndex.read(spark, pqPath), panel, 10))))
      readMb(s"serve_pq_${name}_q100k")(time(s"serve_pq_${name}_q100k")(
        noop(IvfIndex.servePq(idxPq, qdf, panel, 10, 50,
          side.serving, side.books, cellRows = side.counts,
          knownBatchRows = Some(capQ)))))
    }
    results("lut_mb_nominal_p1") = math.rint(capQ * (8 * 16 + 2) * 8 / 1e4) / 100
    writeJson(outJson, copies)
    spark.stop()
  }

  /** Round-14 flip probe: the per-cell pushed-vs-full decision must
    * TRACK min(bytes(all-pushed), bytes(all-full)) across batch sizes
    * — the structural claim behind "PQ can no longer read more than
    * exact". Sweeps the 2M fixture at growing batches and records each
    * strategy's rchar: `adaptive` (the shipped default, occupancy from
    * the sidecar), `allpush` (cellRows withheld → every cell pushed),
    * `allfull` (cellRows forced tiny → every cell a full scan, the r13
    * fallback's byte shape). */
  private def r14Flip(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(1000)
    val outJson = args.drop(1).headOption
    val spark = session()
    import graft.operators.IvfIndex
    def readMb(label: String)(f: => Unit): Unit = {
      val b0 = rchar()
      f
      results(label + "_readmb") = math.rint((rchar() - b0) / 1e4) / 100
    }
    val n = copies * 2000L
    val tmp = s"/tmp/graft_r14pq_probe_$copies" // shared fixture
    val embPath = s"$tmp/emb.parquet"
    val pqPath = s"$tmp/idx_pq"
    val e =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(embPath)))
        spark.read.parquet(embPath)
      else blockClusterEmbeddings(spark, n, embPath)
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(pqPath,
        IvfIndex.SidecarDir)))
      time("build_pq")(IvfIndex.build(e, pqPath, 64, pq = true))
    val side = IvfIndex.readSidecar(spark, pqPath).get
    val idxPq = IvfIndex.readFull(spark, pqPath)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    readMb("calibration_full_scan")(
      IvfIndex.read(spark, pqPath)
        .agg(sum(element_at(col("embedding"), 1))).collect())
    val tinyCells = side.counts.keys.map(_ -> 1L).toMap // forces full
    for (nq <- Seq(30L, 300L, 2000L)) {
      val q = e.filter(col("vec_id") < nq)
        .select((col("vec_id") + lit(970000000000L)).as("q_id"),
          col("embedding").as("q_emb")).localCheckpoint(true)
      val panel = q.select(col("q_id"), col("q_emb"),
        graft.functions.VectorExprs.nearest_centroid(
          col("q_emb"), side.refresh, side.dim).as("cell"))
        .localCheckpoint(true)
      readMb(s"exact_q$nq")(noop(
        IvfIndex.serve(IvfIndex.read(spark, pqPath), panel, 10)))
      readMb(s"adaptive_q$nq")(noop(IvfIndex.servePq(idxPq, q, panel, 10, 50,
        side.serving, side.books, cellRows = side.counts,
        knownBatchRows = Some(nq))))
      readMb(s"allpush_q$nq")(noop(IvfIndex.servePq(idxPq, q, panel, 10, 50,
        side.serving, side.books, knownBatchRows = Some(nq))))
      readMb(s"allfull_q$nq")(noop(IvfIndex.servePq(idxPq, q, panel, 10, 50,
        side.serving, side.books, cellRows = tinyCells,
        knownBatchRows = Some(nq))))
    }
    writeJson(outJson, copies)
    spark.stop()
  }

  /** Round-15 follow-mode churn probe: serving CONTINUITY under real
    * maintenance. A follow-mode serve stream (StreamingOps.serveOnline
    * followIndex=true) drains a growing query directory while
    * append+compact cycles commit new index generations underneath on
    * the main thread — including the pendingAppends window EVERY real
    * cycle passes through (append commits it, compact clears it) and
    * the data-rewritten-but-header-uncommitted window inside compact.
    * Records cycles committed, micro-batches served, rows and distinct
    * queries served (completeness: every query file drained), the
    * final sidecar version crossed, and that the one stream stayed
    * alive throughout — zero restarts. StreamingSpec pins the
    * per-window semantics bit-exactly; this records the SUSTAINED
    * behavior with real interleavings at fixture scale. */
  private def r15Churn(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(100)
    val outJson = args.drop(1).headOption
    val spark = session()
    import graft.operators.IvfIndex
    import graft.queries.VectorQueries
    import scala.jdk.CollectionConverters._
    val n = copies * 2000L
    val fixture = s"/tmp/graft_r14pq_probe_$copies" // shared read-only fixture
    val embPath = s"$fixture/emb.parquet"
    val e =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(embPath)))
        spark.read.parquet(embPath)
      else blockClusterEmbeddings(spark, n, embPath)
    def wipe(p: String): Unit = {
      val d = java.nio.file.Paths.get(p)
      if (java.nio.file.Files.isDirectory(d))
        java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
    }
    val tmp = s"/tmp/graft_r15churn_$copies" // the index MUTATES: fresh every run
    wipe(tmp)
    val idxPath = s"$tmp/idx"; val qdir = s"$tmp/q"; val out = s"$tmp/out"
    var centers: Seq[(Int, Array[Double])] = null
    time("build_pq") { centers = IvfIndex.build(e, idxPath, 64, pq = true) }
    val side0 = IvfIndex.readSidecar(spark, idxPath).get
    val batches = 8
    val q0 = e.filter(col("vec_id") < batches * 2000L)
      .select((col("vec_id") + lit(970000000000L)).as("q_id"),
        col("embedding").as("q_emb")).localCheckpoint(true)
    q0.filter(pmod(col("q_id"), lit(batches.toLong)) === 0L)
      .coalesce(1).write.mode("overwrite").parquet(qdir)
    val stream = spark.readStream.schema(q0.schema)
      .option("maxFilesPerTrigger", "1").parquet(qdir)
    val sq = graft.streaming.StreamingOps.serveOnline(
      spark, stream, idxPath, k = 10, shortlist = 50, out,
      followIndex = true,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(100L),
      pendingGraceMs = 120000L)
    var cycles = 0
    time("churn_wall") {
      for (i <- 1 until batches) {
        // next query file lands while maintenance churns
        q0.filter(pmod(col("q_id"), lit(batches.toLong)) === i.toLong)
          .coalesce(1).write.mode("append").parquet(qdir)
        if (i % 2 == 1) {
          val arrivals = IvfIndex.withCodes(
            VectorQueries.kmeansAssign(
              e.filter(col("vec_id") >= i * 100L &&
                  col("vec_id") < i * 100L + 100L)
                .select((col("vec_id") + lit(980000000000L) +
                  lit(i * 1000000L)).as("vec_id"), col("embedding")),
              centers),
            side0.serving, side0.books)
          IvfIndex.append(spark, idxPath, arrivals)
          IvfIndex.compact(spark, idxPath)
          cycles += 1
        }
      }
      sq.processAllAvailable()
    }
    results("cycles") = cycles.toDouble
    results("stream_alive") = if (sq.isActive) 1.0 else 0.0
    results("batches_served") = java.nio.file.Files.list(
        java.nio.file.Paths.get(out)).iterator().asScala
      .count(_.getFileName.toString.startsWith("batch=")).toDouble
    val served = spark.read.parquet(out)
    results("rows_served") = served.count().toDouble
    results("distinct_queries_served") =
      served.select(col("q_id")).distinct().count().toDouble
    results("expected_queries") = q0.count().toDouble
    results("final_sidecar_version") =
      IvfIndex.readSidecar(spark, idxPath).get.version.toDouble
    sq.stop()
    writeJson(outJson, copies)
    spark.stop()
  }

  /** Round-15 cap probe (VERDICT r15 ask #3): the saturation skip.
    * At the 100k-query UNIFORM cap the shortlists cover essentially
    * every probed page, so the gather must be the full embedding pass
    * — which r14 only learned by paying a (cell, n_id) DISTINCT
    * shuffle over the whole q·shortlist (SCALE_r14_cap: 715 vs 561 MB
    * exact). The winner-cardinality estimate now rides the checkpoint
    * job for free (observed HLL) and skips that analysis when it
    * proves saturation. A/B at one fixture:
    *  - `skip`: honest sidecar occupancy — the estimate proves
    *    saturation, no analysis job;
    *  - `analysis`: occupancy inflated 10000× so probedPages dwarfs
    *    any estimate — the exact DISTINCT runs and over-caps into the
    *    same fallback plan (the r14 uniform shape, byte-for-byte).
    * The HOT leg (100 points × 1000 dups — the traffic a serving tier
    * actually sees) keeps honest occupancy: its ~5k distinct winners
    * sit far under the margin, so the estimate must NOT fire and the
    * per-cell pushed gather must stay byte-identical to r14. */
  private def r15Cap(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(1000)
    val outJson = args.drop(1).headOption
    val spark = session()
    import graft.operators.IvfIndex
    def readMb(label: String)(f: => Unit): Unit = {
      val b0 = rchar()
      f
      results(label + "_readmb") = math.rint((rchar() - b0) / 1e4) / 100
    }
    val n = copies * 2000L
    val tmp = s"/tmp/graft_r14pq_probe_$copies" // shared fixture
    val embPath = s"$tmp/emb.parquet"
    val pqPath = s"$tmp/idx_pq"
    val e =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(embPath)))
        spark.read.parquet(embPath)
      else blockClusterEmbeddings(spark, n, embPath)
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(pqPath,
        IvfIndex.SidecarDir)))
      time("build_pq")(IvfIndex.build(e, pqPath, 64, pq = true))
    val side = IvfIndex.readSidecar(spark, pqPath).get
    val idxPq = IvfIndex.readFull(spark, pqPath)
    val capQ = 100000L
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    readMb("calibration_full_scan")(
      IvfIndex.read(spark, pqPath)
        .agg(sum(element_at(col("embedding"), 1))).collect())
    val qUniform = e.filter(col("vec_id") < capQ)
      .select((col("vec_id") + lit(970000000000L)).as("q_id"),
        col("embedding").as("q_emb")).localCheckpoint(true)
    val hotBase = e.filter(col("vec_id") < 100)
      .select(col("vec_id"), col("embedding"))
    val qHot = hotBase.join(broadcast(spark.range(1000).select(col("id").as("rep"))))
      .select((col("vec_id") * 1000L + col("rep") + lit(970000000000L)).as("q_id"),
        col("embedding").as("q_emb")).localCheckpoint(true)
    def panelOf(qdf: DataFrame) = qdf.select(col("q_id"), col("q_emb"),
      graft.functions.VectorExprs.nearest_centroid(
        col("q_emb"), side.refresh, side.dim).as("cell")).localCheckpoint(true)
    val inflated = side.counts.map { case (c, r) => c -> r * 10000L }
    val panelU = panelOf(qUniform)
    readMb("serve_exact_uniform_q100k")(time("serve_exact_uniform_q100k")(
      noop(IvfIndex.serve(IvfIndex.read(spark, pqPath), panelU, 10))))
    // the skip-vs-analysis A/B alternates and repeats: single runs on
    // this box drift ±30% (BENCH_AB), which would swamp the one-job
    // delta being measured
    for (rep <- 1 to 2) {
      readMb(s"serve_pq_uniform_skip_$rep")(time(s"serve_pq_uniform_skip_$rep")(
        noop(IvfIndex.servePq(idxPq, qUniform, panelU, 10, 50,
          side.serving, side.books, cellRows = side.counts,
          knownBatchRows = Some(capQ)))))
      readMb(s"serve_pq_uniform_analysis_$rep")(time(s"serve_pq_uniform_analysis_$rep")(
        noop(IvfIndex.servePq(idxPq, qUniform, panelU, 10, 50,
          side.serving, side.books, cellRows = inflated,
          knownBatchRows = Some(capQ)))))
    }
    val panelH = panelOf(qHot)
    readMb("serve_exact_hot_q100k")(time("serve_exact_hot_q100k")(
      noop(IvfIndex.serve(IvfIndex.read(spark, pqPath), panelH, 10))))
    readMb("serve_pq_hot_q100k")(time("serve_pq_hot_q100k")(
      noop(IvfIndex.servePq(idxPq, qHot, panelH, 10, 50,
        side.serving, side.books, cellRows = side.counts,
        knownBatchRows = Some(capQ)))))
    writeJson(outJson, copies)
    spark.stop()
  }

  /** Round-15 wave-wall probe (VERDICT r15 ask #6): COVERAGE claims
    * concurrent wave submission makes gather wall ≈ max(wave), not
    * Σ(wave) — this records it. A mid-size batch whose pushed winner
    * set spans ≥8 waves at the production 1024-id wave budget
    * (occupancy withheld so every cell pushes), gathered through the
    * shipped 8-thread pool vs forced-sequential (gatherPool = 1),
    * with the Spark job count recorded for both (same jobs, different
    * overlap — the pool is scheduling, not plan shape; R15OpsSpec
    * pins result equality). */
  private def r15Waves(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(1000)
    val outJson = args.drop(1).headOption
    val spark = session()
    import graft.operators.IvfIndex
    val n = copies * 2000L
    val tmp = s"/tmp/graft_r14pq_probe_$copies" // shared fixture
    val embPath = s"$tmp/emb.parquet"
    val pqPath = s"$tmp/idx_pq"
    val e =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(embPath)))
        spark.read.parquet(embPath)
      else blockClusterEmbeddings(spark, n, embPath)
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(pqPath,
        IvfIndex.SidecarDir)))
      time("build_pq")(IvfIndex.build(e, pqPath, 64, pq = true))
    val side = IvfIndex.readSidecar(spark, pqPath).get
    val idxPq = IvfIndex.readFull(spark, pqPath)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // ~300 queries × shortlist 50 ≈ 15k distinct winners ≈ 15 waves
    // at the 1024-id budget — comfortably ≥8
    val q = e.filter(col("vec_id") < 300)
      .select((col("vec_id") + lit(970000000000L)).as("q_id"),
        col("embedding").as("q_emb")).localCheckpoint(true)
    val panel = q.select(col("q_id"), col("q_emb"),
      graft.functions.VectorExprs.nearest_centroid(
        col("q_emb"), side.refresh, side.dim).as("cell"))
      .localCheckpoint(true)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    def drained(): Int = {
      var prev = -1
      while (jobs.get != prev) { prev = jobs.get; Thread.sleep(200) }
      prev
    }
    for ((label, pool) <- Seq("concurrent8" -> 8, "sequential" -> 1)) {
      drained(); jobs.set(0)
      var served: DataFrame = null
      time(s"gather_construct_$label") {
        // knownBatchRows deliberately NOT threaded: 300×50 is inside
        // the one-job small-batch gate, which would skip waves
        served = IvfIndex.servePq(idxPq, q, panel, 10, 50,
          side.serving, side.books, gatherPool = pool)
      }
      time(s"gather_drain_$label")(noop(served))
      results(s"jobs_$label") = drained().toDouble
    }
    writeJson(outJson, copies)
    spark.stop()
  }

  /** Round-15 LUT broadcast probe (VERDICT r15 ask #2 evidence): the
    * ADC LUT is now built executor-side from the panel's 256 B float
    * residual; r14 materialized the m·k = 128-double LUT into every
    * panel row before the broadcast. Measures the ACTUAL
    * BroadcastExchange dataSize of both panel shapes at the cap
    * geometry (100k queries × probe 4 = 400k panel rows), joined
    * against a small codes frame so the broadcast side dominates.
    * VectorExprsSpec pins the two shapes bit-identical in values. */
  private def r15Lut(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(1000)
    val outJson = args.drop(1).headOption
    val spark = session()
    import graft.operators.IvfIndex
    import graft.queries.VectorQueries
    val n = copies * 2000L
    val tmp = s"/tmp/graft_r14pq_probe_$copies" // shared fixture
    val embPath = s"$tmp/emb.parquet"
    val pqPath = s"$tmp/idx_pq"
    val e =
      if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get(embPath)))
        spark.read.parquet(embPath)
      else blockClusterEmbeddings(spark, n, embPath)
    if (!java.nio.file.Files.isDirectory(java.nio.file.Paths.get(pqPath,
        IvfIndex.SidecarDir)))
      time("build_pq")(IvfIndex.build(e, pqPath, 64, pq = true))
    val side = IvfIndex.readSidecar(spark, pqPath).get
    val capQ = 100000L
    val q = e.filter(col("vec_id") < capQ)
      .select((col("vec_id") + lit(970000000000L)).as("q_id"),
        col("embedding").as("q_emb"))
    val panel = q.select(col("q_id"), col("q_emb"),
      explode(graft.functions.VectorExprs.nearest_cells(
        col("q_emb"), side.refresh, side.dim, 4)).as("cell"))
      .localCheckpoint(true)
    results("panel_rows") = panel.count().toDouble
    val qres = side.serving.tail.foldLeft(
      when(col("cell") === side.serving.head._1.toLong,
        VectorQueries.residualAgainst(col("q_emb"), side.serving.head._2))) {
      case (w, (j, c)) => w.when(col("cell") === j.toLong,
        VectorQueries.residualAgainst(col("q_emb"), c))
    }
    // a tiny probe side: the broadcast build is what's measured
    val codes = IvfIndex.readFull(spark, pqPath)
      .select(col("vec_id").as("n_id"), col("pq"), col("cell"))
      .filter(col("vec_id") < 2000).localCheckpoint(true)
    def broadcastMb(df: DataFrame): Double = {
      // collect() (a one-row aggregate here) executes df's OWN
      // QueryExecution, so the broadcast metrics land in the plan
      // instance traversed below — a sink write would execute a fresh
      // QueryExecution and leave this one's metrics at zero
      df.collect()
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def sizes(p: SparkPlan): Seq[Long] = {
        val self =
          if (p.getClass.getSimpleName.contains("BroadcastExchange"))
            p.metrics.get("dataSize").map(_.value).toSeq
          else Seq.empty
        val inner = p match {
          case a: AdaptiveSparkPlanExec => sizes(a.executedPlan)
          case s: QueryStageExec => sizes(s.plan)
          case _ => Seq.empty
        }
        self ++ inner ++ p.children.flatMap(sizes)
      }
      math.rint(sizes(df.queryExecution.executedPlan).sum / 1e4) / 100
    }
    // the aggregate CONSUMES the payload column — a bare count() lets
    // Catalyst prune it off the broadcast side and both shapes
    // measure identical (caught live: 16.78 MB both, = q_id+cell only)
    // r15 shape: the panel ships the float residual
    val qSideNew = panel.select(col("q_id"), col("cell"), qres.as("qres"))
    results("broadcast_residual_mb") =
      broadcastMb(codes.join(broadcast(qSideNew), "cell")
        .select(max(element_at(col("qres"), 1))).toDF("c"))
    // r14 shape: the panel ships the materialized m·k-double LUT
    val qSideOld = panel.select(col("q_id"), col("cell"),
      graft.functions.VectorExprs.pq_lut(qres, side.books).as("lut"))
    results("broadcast_lut_mb") =
      broadcastMb(codes.join(broadcast(qSideOld), "cell")
        .select(max(element_at(col("lut"), 1))).toDF("c"))
    writeJson(outJson, copies)
    spark.stop()
  }

  /** Round-14 sidecar economics probe (VERDICT r13 ask #4): the
    * sidecar at index-appropriate 100 TB scale — k=100k cells, d=768 —
    * is ~1.6 GB of base64, fully re-written per maintenance op and
    * re-read per cache miss. Measures write/read wall and on-disk
    * bytes for the sharded format (25 parallel `cells-*` files) and,
    * for contrast, the largest single-file (unsharded) size. */
  private def r14Sidecar(args: Array[String]): Unit = {
    val outJson = args.headOption
    val spark = session()
    import graft.operators.IvfIndex
    def synth(k: Int, d: Int, seed: Long): IvfIndex.Sidecar = {
      val rnd = new java.util.Random(seed)
      def vec() = Array.fill(d)(rnd.nextDouble())
      IvfIndex.Sidecar(
        serving = (0 until k).map(c => c -> vec()),
        refresh = (0 until k).map(c => c -> vec()),
        counts = (0 until k).map(c => c.toLong -> 1000000L).toMap,
        staleCells = Set.empty, pendingAppends = false,
        maxSeq = 0L, version = 1L,
        books = (0 until 8).map(s => (0 until 16).map(c => c -> vec()).toSeq),
        compactedSeq = 0L)
    }
    def dirMb(p: String): Double = {
      import scala.jdk.CollectionConverters._
      math.rint(java.nio.file.Files.walk(java.nio.file.Paths.get(p))
        .iterator().asScala.filter(java.nio.file.Files.isRegularFile(_))
        .map(java.nio.file.Files.size).sum / 1e4) / 100
    }
    for ((k, d, label) <- Seq((4096, 768, "k4096"), (100000, 768, "k100k"))) {
      val path = s"/tmp/graft_r14_sidecar_$label"
      val dir = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.isDirectory(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
      IvfIndex.SidecarCache.invalidate(path)
      val sc = synth(k, d, 14L)
      time(s"sidecar_write_$label")(IvfIndex.writeSidecar(spark, path, sc))
      results(s"sidecar_mb_$label") = dirMb(path)
      var back: Option[IvfIndex.Sidecar] = None
      time(s"sidecar_read_$label") { back = IvfIndex.readSidecar(spark, path) }
      require(back.exists(b => b.serving.length == k &&
        b.serving.head._2.sameElements(sc.serving.head._2)),
        s"sidecar roundtrip mismatch at $label")
      // the maintenance-loop shape: read + rewrite (one op's sidecar IO)
      time(s"sidecar_rewrite_$label")(IvfIndex.writeSidecar(spark, path,
        back.get.copy(version = back.get.version + 1L)))
    }
    writeJson(outJson, 0)
    spark.stop()
  }

  /** Round-14 diagnostic: where does a pushed WAVE's wall go —
    * Catalyst planning of the ~40-branch union vs execution? Runs
    * wave-shaped plans against the already-built r14pq 2M fixture and
    * times executedPlan construction separately from the job. */
  private def r14Diag(args: Array[String]): Unit = {
    val spark = session()
    require(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get("/tmp/graft_r14pq_probe_1000/idx_pq")),
      "r14diag reads the r14pq fixture — run `runMain graft.ScaleProbe " +
        "r14pq 1000 /tmp/out.json` first")
    val idx = spark.read.parquet("/tmp/graft_r14pq_probe_1000/idx_pq")
      .select(col("vec_id"), col("embedding"), col("cell").cast("long").as("cell"))
    val rnd = new java.util.Random(7)
    def wave(nCells: Int, idsPer: Int, branchMax: Int, codegen: Boolean = true): Unit = {
      val branches = (0 until nCells).map(_.toLong).flatMap { c =>
        val ids = Array.fill(idsPer)(math.abs(rnd.nextLong()) % 2000000L).distinct.sorted
        ids.grouped(branchMax).map { g =>
          idx.filter(col("cell") === c)
            .filter(g.map(i => col("vec_id") === lit(i)).reduce(_ || _))
            .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
        }
      }
      val df = branches.reduce(_ unionByName _)
      spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      var t0 = System.nanoTime()
      df.queryExecution.executedPlan
      val planS = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      val n = df.count()
      val execS = (System.nanoTime() - t0) / 1e9
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      println(f"WAVE cells=$nCells idsPer=$idsPer branchMax=$branchMax codegen=$codegen plan=$planS%.2f exec=$execS%.2f rows=$n")
    }
    wave(40, 25, 128)
    wave(40, 25, 128)
    wave(40, 25, 1024)
    wave(64, 16, 128)
    wave(8, 128, 128)
    wave(40, 25, 128, codegen = false)
    spark.stop()
  }

  /** Temporary diagnostic: does a pushed In(vec_id) predicate actually
    * skip pages of the (cell, vec_id)-sorted index layout? Minimal
    * query shapes against the already-built 2M index, bytes via
    * /proc/self/io rchar. */
  private def r13Diag(args: Array[String]): Unit = {
    val spark = session()
    def rcharBytes(): Long =
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get("/proc/self/io"))
        .stream().filter(_.startsWith("rchar:"))
        .findFirst().map[Long](l => l.split(":\\s*")(1).trim.toLong).orElse(0L)
    def readMb(label: String)(f: => Unit): Unit = {
      val b0 = rcharBytes()
      f
      val mb = math.rint((rcharBytes() - b0) / 1e4) / 100
      println(f"$label%-40s $mb%10.2f MB")
    }
    val idx = "/tmp/graft_r13pq_probe_1000/idx_pq"
    require(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(idx)),
      s"r13diag reads the r13pq fixture — run `runMain graft.ScaleProbe " +
        s"r13pq 1000 /tmp/out.json` first to build $idx")
    val df = spark.read.parquet(idx)
    def noop(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()
    val ids = (0 until 200).map(i => (i * 9973L + 17L) % 2000000L).sorted
    readMb("full_embedding_scan")(noop(df.select(col("vec_id"), col("embedding"))))
    readMb("in200_embedding")(noop(df
      .filter(col("vec_id").isInCollection(ids))
      .select(col("vec_id"), col("embedding"))))
    readMb("in200_vec_id_only")(noop(df
      .filter(col("vec_id").isInCollection(ids))
      .select(col("vec_id"))))
    // hypothesis: pages of REPEATED (list) columns can't be skipped by
    // parquet's column-index filter, but STRUCT leaves are flat
    // (definition levels only) and should skip like vec_id does
    val structDir = "/tmp/graft_r13diag_struct"
    df.select(col("vec_id"),
        struct((0 until 64).map(i =>
          element_at(col("embedding"), i + 1).as(s"f$i")): _*).as("emb"))
      .repartitionByRange(16, col("vec_id"))
      .sortWithinPartitions(col("vec_id"))
      .write.mode("overwrite")
      .option("parquet.page.row.count.limit", "256")
      .parquet(structDir)
    val flat = spark.read.parquet(structDir)
    readMb("full_struct_scan")(noop(flat.select(col("vec_id"), col("emb"))))
    readMb("in200_struct")(noop(flat
      .filter(col("vec_id").isInCollection(ids))
      .select(col("vec_id"), col("emb"))))
    // single-Eq probes: the simplest page-skippable predicate; if even
    // this reads a whole file's columns, column-index filtering is off
    readMb("eq1_embedding")(noop(df
      .filter(col("vec_id") === 1234567L)
      .select(col("vec_id"), col("embedding"))))
    readMb("eq1_struct")(noop(flat
      .filter(col("vec_id") === 1234567L)
      .select(col("vec_id"), col("emb"))))
    // OR-of-Eq: parquet's column-index filter unions per-Eq row
    // ranges, so this should skip pages where native In cannot
    val orPred = ids.map(i => col("vec_id") === i).reduce(_ || _)
    readMb("oreq200_embedding")(noop(df
      .filter(orPred).select(col("vec_id"), col("embedding"))))
    readMb("oreq200_struct")(noop(flat
      .filter(orPred).select(col("vec_id"), col("emb"))))
    // page-size sensitivity: the gather reads whole pages, so page
    // rows set its cost — re-write the list layout at 64-row pages
    val smallDir = "/tmp/graft_r13diag_small"
    df.select(col("vec_id"), col("embedding"))
      .repartitionByRange(16, col("vec_id"))
      .sortWithinPartitions(col("vec_id"))
      .write.mode("overwrite")
      .option("parquet.page.row.count.limit", "64")
      .parquet(smallDir)
    val small = spark.read.parquet(smallDir)
    readMb("oreq200_embedding_page64")(noop(small
      .filter(orPred).select(col("vec_id"), col("embedding"))))
    // the REAL gather shape: cell partition predicate + id predicate
    // on the cell-partitioned index layout
    readMb("oreq200_idx_cells")(noop(df
      .filter(col("cell").isin(0L to 9L: _*)).filter(orPred)
      .select(col("vec_id"), col("embedding"))))
    // isolate the no-skip cause: extra columns vs hive partitioning
    val layoutA = "/tmp/graft_r13diag_flat_allcols" // flat dir, seq+pq ride along
    df.select(col("vec_id"), col("embedding"), col("seq"), col("pq"), col("cell"))
      .repartitionByRange(16, col("cell"), col("vec_id"))
      .sortWithinPartitions(col("cell"), col("vec_id"))
      .write.mode("overwrite")
      .option("parquet.page.row.count.limit", "256")
      .parquet(layoutA)
    val a = spark.read.parquet(layoutA)
    readMb("oreq200_flat_allcols")(noop(a
      .filter(orPred).select(col("vec_id"), col("embedding"))))
    val layoutB = "/tmp/graft_r13diag_part_2cols" // partitionBy, 2 data cols
    df.select(col("vec_id"), col("embedding"), col("cell"))
      .repartitionByRange(16, col("cell"), col("vec_id"))
      .sortWithinPartitions(col("cell"), col("vec_id"))
      .write.mode("overwrite")
      .option("parquet.page.row.count.limit", "256")
      .partitionBy("cell").parquet(layoutB)
    val b = spark.read.parquet(layoutB)
    readMb("oreq200_part_2cols")(noop(b
      .filter(orPred).select(col("vec_id"), col("embedding"))))
    // page-structure ground truth via the offset index
    def pageStats(label: String, file: String): Unit = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file),
        spark.sessionState.newHadoopConf())
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val rg = r.getFooter.getBlocks.get(0)
        import scala.jdk.CollectionConverters._
        rg.getColumns.asScala.foreach { cc =>
          val oi = r.readOffsetIndex(cc)
          val np = if (oi == null) -1 else oi.getPageCount
          println(s"PAGES $label ${cc.getPath} rows=${rg.getRowCount} pages=$np")
        }
      } finally r.close()
    }
    def firstFile(dir: String): String = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toSeq.head.toString
    }
    pageStats("idx_pq", firstFile(idx))
    pageStats("small64", firstFile(smallDir))
    pageStats("part2", firstFile(layoutB))
    // decisive: ask parquet-mr itself how many rows survive the
    // column-index row ranges for the or-eq predicate, per layout
    def filteredCount(label: String, file: String): Unit = {
      import org.apache.parquet.filter2.predicate.FilterApi
      import org.apache.parquet.filter2.compat.FilterCompat
      val vcol = FilterApi.longColumn("vec_id")
      val pred = ids.map(i =>
          FilterApi.eq(vcol, java.lang.Long.valueOf(i))
            .asInstanceOf[org.apache.parquet.filter2.predicate.FilterPredicate])
        .reduce(FilterApi.or)
      val conf = spark.sessionState.newHadoopConf()
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file), conf)
      val opts = org.apache.parquet.HadoopReadOptions.builder(conf)
        .withRecordFilter(FilterCompat.get(pred)).build()
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in, opts)
      try println(s"FILTERED $label total=${r.getRecordCount} " +
        s"afterRanges=${r.getFilteredRecordCount}")
      finally r.close()
    }
    filteredCount("idx_pq", firstFile(idx))
    filteredCount("small64", firstFile(smallDir))
    filteredCount("part2", firstFile(layoutB))
    def pageRanges(label: String, file: String): Unit = {
      val conf = spark.sessionState.newHadoopConf()
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        val rg = r.getFooter.getBlocks.get(0)
        val cc = rg.getColumns.asScala.find(_.getPath.toString.contains("vec_id")).get
        val ci = r.readColumnIndex(cc)
        if (ci == null) { println(s"RANGES $label: NO column index"); return }
        val mins = ci.getMinValues.asScala.take(6).map(b =>
          java.nio.ByteBuffer.wrap(b.array()).order(
            java.nio.ByteOrder.LITTLE_ENDIAN).getLong)
        val maxs = ci.getMaxValues.asScala.take(6).map(b =>
          java.nio.ByteBuffer.wrap(b.array()).order(
            java.nio.ByteOrder.LITTLE_ENDIAN).getLong)
        println(s"RANGES $label boundaryOrder=${ci.getBoundaryOrder} " +
          mins.zip(maxs).map { case (a, c) => s"[$a..$c]" }.mkString(" "))
      } finally r.close()
    }
    pageRanges("idx_pq", firstFile(idx))
    pageRanges("small64", firstFile(smallDir))
    pageRanges("part2", firstFile(layoutB))
    spark.stop()
  }

  /** Round-13 cap probe (VERDICT r12 #4): the PQ serve path ships a
    * per-panel-row ADC LUT (m·k = 128 doubles ≈ 1 KB) through the
    * shortlist broadcast — at the ServeMaxBatch cap (100k queries)
    * that is ~110 MB, doubled by probe 2. Runs the REAL dialect serve
    * at the cap against a small index (the broadcast weight is
    * panel-sized, independent of index size) and records the walls and
    * the nominal LUT MB — the evidence the cap fits executor budgets,
    * or the case for lowering it. Above the push ceiling
    * (q·shortlist > PqGatherPushMax) this also exercises the fallback
    * re-rank gather at its real size. */
  private def r13Cap(args: Array[String]): Unit = {
    val outJson = args.headOption
    val spark = session()
    import graft.operators.IvfIndex
    val tmp = "/tmp/graft_r13cap_probe"
    val nIdx = 20000L
    val dim = 64
    spark.range(nIdx).select(col("id").as("vec_id"),
        array((0 until dim).map(i => rand(42L + i).cast("float")): _*)
          .as("embedding"))
      .write.mode("overwrite").parquet(s"$tmp/emb.parquet")
    val e = spark.read.parquet(s"$tmp/emb.parquet")
    val idxPath = s"$tmp/idx"
    time("build_pq_20k")(IvfIndex.build(e, idxPath, 64, pq = true))
    val g = graft.sql.GraftSession(spark, tmp)
    val capQ = 100000L
    spark.range(capQ).select((col("id") + lit(970000000000L)).as("vec_id"),
        array((0 until dim).map(i => rand(1042L + i).cast("float")): _*)
          .as("embedding"))
      .write.mode("overwrite").parquet(s"$tmp/qcap.parquet")
    results("cap_queries") = capQ.toDouble
    results("lut_mb_nominal_p1") = math.rint(capQ * (8 * 16 + 2) * 8 / 1e4) / 100
    results("lut_mb_nominal_p2") = math.rint(2 * capQ * (8 * 16 + 2) * 8 / 1e4) / 100
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    time("serve_pq_q100k")(noop(g.sql(
      s"serve vec_id, embedding from '$idxPath' query '$tmp/qcap.parquet' " +
        "top 10 pq shortlist 50")))
    time("serve_pq_q100k_probe2")(noop(g.sql(
      s"serve vec_id, embedding from '$idxPath' query '$tmp/qcap.parquet' " +
        "top 10 probe 2 pq shortlist 50")))
    time("serve_exact_q100k")(noop(g.sql(
      s"serve vec_id, embedding from '$idxPath' query '$tmp/qcap.parquet' top 10")))
    writeJson(outJson, 0)
    spark.stop()
  }

  /** Round-13 compact-scoping probe (VERDICT r12 #3): compact's
    * duplicate analysis must track the APPENDED fraction, not the
    * index size. A fixed ~4000-row re-ingest batch is appended to
    * indexes of different sizes (run with copies 100 and 1000) and the
    * analysis is timed both ways:
    *  - `analysis_scoped` = the r13 shape — appended ids off the
    *    seq-pruned files, semi-join the narrow scan on them, window
    *    the matched rows only;
    *  - `analysis_unscoped_r12` = the r12 shape — one (vec_id, seq)
    *    window over EVERY row of the index;
    *  - `compact_total` = the real op end-to-end (analysis + rewrite
    *    of the touched cells + sidecar refresh).
    * Scoped must stay ~flat across the index growth while the
    * unscoped window grows with the corpus — on a 32-core local box
    * the walls converge (a few-M-row narrow window is free), so the
    * probe also records each leg's SHUFFLE-WRITE bytes: the scoped
    * analysis shuffles O(appended) rows where the r12 window shuffles
    * the whole index's (vec_id, seq) — the number that decides the op
    * at 100 TB. */
  private def r13Compact(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.drop(1).headOption
    val spark = session()
    import graft.queries.VectorQueries
    import graft.operators.IvfIndex
    import org.apache.spark.sql.expressions.Window
    val shuffleMb = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null)
            shuffleMb.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    def drained(): Long = {
      var prev = -1L
      while (shuffleMb.get != prev) { prev = shuffleMb.get; Thread.sleep(250) }
      prev
    }
    def withShuffleMb(label: String)(f: => Unit): Unit = {
      val b0 = drained()
      f
      results(label + "_shufflemb") = math.rint((drained() - b0) / 1e4) / 100
    }
    val tmp = s"/tmp/graft_r13cmp_probe_$copies"
    // content-agnostic synthetic corpus (the analysis only touches
    // vec_id/seq/cell): generated via range so the 10M-row leg doesn't
    // build a thousands-way union plan
    val n = copies * 2000L
    val dim = 64
    spark.range(n).select(col("id").as("vec_id"),
        array((0 until dim).map(i => rand(42L + i).cast("float")): _*)
          .as("embedding"))
      .write.mode("overwrite").parquet(s"$tmp/emb.parquet")
    val e = spark.read.parquet(s"$tmp/emb.parquet")
    val rows = e.count()
    println(s"copies=$copies vecs=$rows")
    val idxPath = s"$tmp/idx"
    var centers: Seq[(Int, Array[Double])] = Seq.empty
    time("index_build") { centers = IvfIndex.build(e, idxPath, 64) }
    // a FIXED-size (~4000-row) re-ingest batch, stride-scattered over
    // the id range — the same absolute appended work at every corpus
    // size, so the analysis legs are directly comparable across runs
    val stride = math.max(1L, rows / 4000L)
    val batch = e.filter(pmod(col("vec_id"), lit(stride)) === 7L)
      .localCheckpoint(true)
    println(s"appended=${batch.count()}")
    time("append_fixed_batch")(IvfIndex.append(spark, idxPath,
      VectorQueries.kmeansAssign(batch, centers)))
    val s = IvfIndex.readSidecar(spark, idxPath).get
    results("appended_frac") = math.rint(batch.count().toDouble / rows * 10000) / 10000
    val narrow = spark.read.parquet(idxPath)
      .select(col("vec_id"), col("seq"), col("cell").cast("long").as("cell"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("seq").desc, col("cell").desc)
    withShuffleMb("analysis_scoped")(time("analysis_scoped") {
      val appended = narrow.filter(col("seq") > s.compactedSeq)
      val scoped = narrow.join(
        broadcast(appended.select(col("vec_id")).distinct()), "vec_id")
      val nc = scoped.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") > 1).select(col("cell")).distinct().count()
      println(s"loser_cells_scoped=$nc")
    })
    withShuffleMb("analysis_unscoped_r12")(time("analysis_unscoped_r12") {
      val nc = narrow.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") > 1).select(col("cell")).distinct().count()
      println(s"loser_cells_unscoped=$nc")
    })
    time("compact_total") {
      println(s"compacted_cells=${IvfIndex.compact(spark, idxPath).size}")
    }
    writeJson(outJson, copies)
    spark.stop()
  }

  private def r11New(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.drop(1).headOption
    val spark = session()
    import graft.queries.VectorQueries
    import graft.operators.IvfIndex
    val tmp = s"/tmp/graft_r11_probe_$copies"
    scaled(spark, "embeddings", Seq("vec_id"), copies)
      .select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$tmp/emb.parquet")
    val e = spark.read.parquet(s"$tmp/emb.parquet")
    println(s"copies=$copies vecs=${e.count()}")
    val idxPath = s"$tmp/idx"
    // k=64 so the dirty/touched granularity is ~1.6% of the corpus —
    // the cell count a real deployment sizes (k ∝ corpus/cell-target)
    val K = 64
    var centers: Seq[(Int, Array[Double])] = Seq.empty
    time("index_build") { centers = IvfIndex.build(e, idxPath, K) }
    var refreshed: Seq[(Int, Array[Double])] = Seq.empty
    time("refresh_means") {
      refreshed = VectorQueries.refreshedCenters(IvfIndex.read(spark, idxPath))
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // controlled dirty sweep: d of the k cells pushed past the
    // threshold (+0.1 per dim ≫ sqrt(thresh/64)), the rest untouched.
    // Record the dirty-cell OCCUPANCY next to each wall so "tracks
    // the dirty fraction" is checkable in rows, not cell counts
    // (k-means cells are not equal-sized).
    val occupancy = IvfIndex.read(spark, idxPath)
      .groupBy(col("cell")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = occupancy.values.sum
    for (d <- Seq(0, 1, 8, K)) {
      val dirtyCells = centers.take(d).map(_._1.toLong)
      val frac = dirtyCells.map(occupancy.getOrElse(_, 0L)).sum.toDouble / total
      val newC = centers.zipWithIndex.map { case ((c, arr), i) =>
        if (i < d) (c, arr.map(_ + 0.1)) else (c, arr) }
      time(s"repair_indexed_dirty$d")(noop(VectorQueries.ivfRepairIndexed(
        spark, idxPath, centers, newC, VectorQueries.IVF_REPAIR_THRESH)))
      results(s"repair_indexed_dirty${d}_rowfrac") = math.rint(frac * 1000) / 1000
    }
    // the natural refresh dirt (whatever the means moved) for context
    time("repair_indexed_natural")(noop(VectorQueries.ivfRepairIndexed(
      spark, idxPath, centers, refreshed, VectorQueries.IVF_REPAIR_THRESH)))
    // the r10 in-memory lifecycle A/B at the gate's k=4: fit +
    // persisted assignment + re-score (no index reuse)
    time("repair_inmem_lifecycle")(noop(VectorQueries.ivfRepair(e)))
    // incremental upsert, clustered arrivals: 20 vectors that land in
    // ONE cell — only that cell's files rewrite (the locality story)
    val oneCell = centers.head._1.toLong
    val clustered = IvfIndex.read(spark, idxPath)
      .filter(col("cell") === oneCell).limit(20)
      .select((col("vec_id") + lit(900000000000L)).as("vec_id"),
        col("embedding"))
      .localCheckpoint(true)
    time("upsert_20_onecell")(IvfIndex.upsert(spark, idxPath,
      VectorQueries.kmeansAssign(clustered, centers)))
    results("upsert_20_onecell_rowfrac") =
      math.rint(occupancy(oneCell).toDouble / total * 1000) / 1000
    // and SCATTERED arrivals (~0.1% uniform): they touch most cells,
    // so the dynamic-overwrite upsert degenerates toward a full
    // rewrite — recorded honestly; high-rate scattered ingest should
    // batch by cell (or append) rather than overwrite per batch
    val scattered = e.filter(pmod(col("vec_id"), lit(1024L)) === 7L)
      .select((col("vec_id") + lit(950000000000L)).as("vec_id"),
        col("embedding"))
    println(s"arrivals_scattered=${scattered.count()}")
    time("upsert_0p1pct_scattered")(IvfIndex.upsert(spark, idxPath,
      VectorQueries.kmeansAssign(scattered, centers)))
    writeJson(outJson, copies)
    spark.stop()
  }

  /** Round-11 skew-resilience evidence (VERDICT r10 #7): d18's
    * edges⋈ranks join — the dedup-graph shape whose hot vertices
    * BucketGuard can only CAP, not balance — on the duplication-salted
    * fixture, A/B with AQE skew-join handling off/on. Recorded per
    * leg: wall, the max task duration (the straggler witness), and
    * the number of `skew=true` joins in the FINAL adaptive plan — the
    * direct evidence AQE actually split the skewed partitions rather
    * than merely being enabled. Legs interleave over two rounds so
    * box drift can't masquerade as the result. */
  private def r11Skew(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.drop(1).headOption
    val spark = session()
    import graft.queries.DedupQueries
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null) {
          var cur = maxTaskMs.get
          while (te.taskInfo.duration > cur &&
            !maxTaskMs.compareAndSet(cur, te.taskInfo.duration))
            cur = maxTaskMs.get
        }
    })
    // AQE skew thresholds sized to probe partitions (defaults target
    // 256 MB cluster partitions and would never fire at probe scale)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    val tmp = s"/tmp/graft_r11_skew_$copies"
    scaled(spark, "documents", Seq("doc_id"), copies)
      .select(col("doc_id"), col("source"), col("text"))
      .write.mode("overwrite").parquet(s"$tmp/docs.parquet")
    val docs = spark.read.parquet(s"$tmp/docs.parquet")
    println(s"copies=$copies docs=${docs.count()}")
    // the duplication fixture's LSH pairs: every duplicate family is a
    // (capped) near-clique, so a handful of vertices carry most edges
    // — exactly the key skew the ranks join inherits
    // the fixture's own pairs spread ~uniformly over vertices, so the
    // hub scenario is SALTED in (the r7 fact-join probe's discipline):
    // 30% of edges remap onto one hot vertex — the boilerplate hub a
    // template farm produces, whose rank-join partition dwarfs the rest
    DedupQueries.candidatePairsOf(
        DedupQueries.sigOf(docs.select(col("doc_id"), col("text"))))
      .withColumn("doc_a",
        when(pmod(col("doc_b"), lit(10)) < 3, lit(7L)).otherwise(col("doc_a")))
      .write.mode("overwrite").parquet(s"$tmp/pairs.parquet")
    val pairs = spark.read.parquet(s"$tmp/pairs.parquet")
    println(s"pair_edges=${pairs.count()}")
    def leg(label: String, skewHandling: Boolean, forceSmj: Boolean): Unit = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewHandling.toString)
      // the DEFAULT plan broadcasts the vertex frame (ranks/degrees ≪
      // edges) — skew-immune by shape; forcing SMJ probes the 100 TB
      // regime where a billion-vertex rank frame can't broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        if (forceSmj) "-1" else "10485760")
      maxTaskMs.set(0)
      var skewJoins = 0
      time(label) {
        val out = DedupQueries.dupPagerankOf(pairs, iters = 3)
        // collect, not count: count() wraps a NEW QueryExecution, so
        // the adaptive plan inspected below would never finalize
        val n = out.collect().length
        require(n > 0)
        skewJoins = "skew=true".r
          .findAllIn(out.queryExecution.executedPlan.toString).length
        if (sys.env.contains("GRAFT_DEBUG_SKEW"))
          println(out.queryExecution.executedPlan.toString.take(4000))
      }
      results(label + "_maxtasksec") = math.rint(maxTaskMs.get / 10.0) / 100.0
      results(label + "_skewjoins") = skewJoins.toDouble
    }
    leg("warm_naive", skewHandling = false, forceSmj = true)
    // the default-plan leg: vertex side broadcasts, nothing to skew
    leg("bcast_default", skewHandling = true, forceSmj = false)
    for (round <- 1 to 2) {
      leg(s"pagerank_smj_naive_$round", skewHandling = false, forceSmj = true)
      leg(s"pagerank_smj_aqeskew_$round", skewHandling = true, forceSmj = true)
    }
    // d04's verification GATHER — every candidate edge pulls its doc's
    // bytes (the Jaccard-check shape): both join children are PLAIN
    // shuffles, the shape AQE can actually skew-split. (The pagerank
    // rounds above can't be: their rank side has an aggregation
    // between shuffle and join, so splitting would have to recompute
    // the agg — AQE correctly leaves them alone, and their DEFAULT
    // plan broadcasts the vertex frame anyway.)
    val feats = docs.select(col("doc_id"), length(col("text")).as("len"))
    def gatherLeg(label: String, skewHandling: Boolean): Unit = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewHandling.toString)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      maxTaskMs.set(0)
      var skewJoins = 0
      time(label) {
        // sum(doc_b) keeps the varying edge endpoint in the shuffled
        // row — a hot partition of one repeated key alone compresses
        // to almost nothing and byte-based skew detection can't see it
        val out = pairs.join(feats, pairs("doc_a") === feats("doc_id"))
          .agg(sum(col("len")).as("bytes"), count(lit(1)).as("n"),
            sum(col("doc_b")).as("chk"))
        require(out.collect().head.getLong(1) > 0)
        skewJoins = "skew=true".r
          .findAllIn(out.queryExecution.executedPlan.toString).length
        if (sys.env.contains("GRAFT_DEBUG_SKEW"))
          println(out.queryExecution.executedPlan.toString.take(4000))
      }
      results(label + "_maxtasksec") = math.rint(maxTaskMs.get / 10.0) / 100.0
      results(label + "_skewjoins") = skewJoins.toDouble
    }
    for (round <- 1 to 2) {
      gatherLeg(s"gather_naive_$round", skewHandling = false)
      gatherLeg(s"gather_aqeskew_$round", skewHandling = true)
    }
    writeJson(outJson, copies)
    spark.stop()
  }

  /** Round-11 p13 A/B (VERDICT r10 #6): the fused one-profile-scan
    * calibratedMix vs the round-10 shape (quality/profile recomputed
    * per leg: CDF, canonical ranking, survivor bucket, mix
    * tokenization). Legs INTERLEAVE over two rounds in one JVM so box
    * drift can't masquerade as the result. */
  private def r11P13(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.drop(1).headOption
    val spark = session()
    import graft.queries.{DedupQueries, PipelineQueries, TextQueries}
    val tmp = s"/tmp/graft_r11_p13_$copies"
    scaled(spark, "documents", Seq("doc_id"), copies)
      .select(col("doc_id"), col("source"), col("text"))
      .write.mode("overwrite").parquet(s"$tmp/docs.parquet")
    val docs = spark.read.parquet(s"$tmp/docs.parquet")
    println(s"copies=$copies docs=${docs.count()}")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // the round-10 shape, verbatim from the r10 builder: each leg
    // re-derives its signal from the text column
    def unfused(): org.apache.spark.sql.DataFrame = {
      val cdf = broadcast(TextQueries.sourceCdfOf(
        TextQueries.qualityBuckets(docs)))
      val docsIdText = docs.select(col("doc_id"), col("text"))
      val canon = DedupQueries.canonicalPickOf(docsIdText)
        .filter(col("keep") === 1).select(col("doc_id"))
      val surv = docs
        .select(col("doc_id"), col("source"), col("text"),
          floor(TextQueries.qualityCol(col("text"),
            graft.functions.TextProfileExprs.text_profile(col("text")))
            .cast(graft.core.Det.dec) * lit(100))
            .cast(org.apache.spark.sql.types.LongType).as("bucket"))
        .join(cdf, Seq("source", "bucket"))
        .filter(col("cum") * 10 >= col("n_src") * 3)
        .join(canon, "doc_id")
        .select(col("doc_id"), col("source"), col("text"))
      PipelineQueries.tokenBudgetMix(surv, 500L)
    }
    time("warm")(noop(unfused()))
    // leg decomposition: what actually dominates the composition
    time("leg_cdf")(noop(TextQueries.sourceCdfOf(
      TextQueries.qualityBuckets(docs))))
    time("leg_pairs_cc_rank")(noop(DedupQueries.canonicalPickOf(
      docs.select(col("doc_id"), col("text")))))
    // …and the canon leg's own stages: the round-11 finding is that
    // CC over the O(bucket²) pair set dominated the composition; the
    // star contraction (component-equal, O(bucket) edges) halves it
    val sigCached = DedupQueries.sigOf(docs.select(col("doc_id"), col("text")))
      .localCheckpoint(true)
    time("leg_sig_alone") {
      noop(DedupQueries.sigOf(docs.select(col("doc_id"), col("text"))))
    }
    var pairsChk: org.apache.spark.sql.DataFrame = null
    time("leg_pairs_build") {
      pairsChk = DedupQueries.candidatePairsOf(sigCached).localCheckpoint(true)
    }
    var starsChk: org.apache.spark.sql.DataFrame = null
    time("leg_stars_build") {
      starsChk = DedupQueries.candidateStarsOf(sigCached).localCheckpoint(true)
    }
    results("leg_pairs_edges") = pairsChk.count().toDouble
    results("leg_stars_edges") = starsChk.count().toDouble
    time("leg_cc_over_pairs")(noop(
      graft.core.ConnectedComponents.run(pairsChk, "doc_a", "doc_b")))
    time("leg_cc_over_stars")(noop(
      graft.core.ConnectedComponents.run(starsChk, "doc_a", "doc_b")))
    time("leg_mix_alone")(noop(PipelineQueries.tokenBudgetMix(
      docs.select(col("doc_id"), col("source"), col("text")), 500L)))
    for (round <- 1 to 2) {
      time(s"p13_unfused_r10_$round")(noop(unfused()))
      time(s"p13_fused_r11_$round")(noop(
        PipelineQueries.calibratedMix(docs, 500L)))
    }
    writeJson(outJson, copies)
    spark.stop()
  }

  /** Round-10 operator probe: v41 repair and m06 video signatures at
    * copies× — both must scale as ONE narrow pass + bounded
    * aggregation (repair additionally prunes to dirty cells). */
  private def r10New(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.drop(1).headOption
    val spark = session()
    import graft.queries.VectorQueries
    val e = scaled(spark, "embeddings", Seq("vec_id"), copies)
      .select(col("vec_id"), col("embedding")).cache()
    println(s"copies=$copies vecs=${e.count()}")
    time("v41_ivf_repair")(VectorQueries.ivfRepair(e)
      .write.format("noop").mode("overwrite").save())
    e.unpersist(blocking = false)
    implicit val sp: SparkSession = spark
    val docs = scaled(spark, "documents", Seq("doc_id"), copies).cache()
    println(s"docs=${docs.count()}")
    time("m06_video_sigs") {
      val sigs = graft.operators.Multimodal.videoSignatures(
        graft.operators.Multimodal.mediaFromDocuments(docs)).toDF()
      sigs.groupBy(col("sig")).agg(count(lit(1)).as("n"))
        .agg(sum(col("n")).as("n_videos"), count(lit(1)).as("n_distinct"))
        .write.format("noop").mode("overwrite").save()
    }
    docs.unpersist(blocking = false)
    // v45's storage story at SERVING geometry (k=64 cells, a 5-query
    // panel probing only its own cells): persist the index partitioned
    // by cell, then serve the same top-5 search (a) from the pruned
    // partitioned layout — the scan reads ONLY probed cells' files —
    // vs (b) the identical plan over a flat (unpartitioned) copy,
    // where the cell predicate can only post-filter a full scan. The
    // gap is pure partition-pruning I/O; it widens with corpus size.
    val e2 = scaled(spark, "embeddings", Seq("vec_id"), copies)
      .select(col("vec_id"), col("embedding")).cache()
    println(s"vecs2=${e2.count()}")
    val centers = graft.queries.VectorQueries.kmeansFit(e2, 64, 2)
    val assigned = graft.queries.VectorQueries.kmeansAssign(e2, centers)
    val partDir = s"/tmp/graft_probe_ivf_part_$copies"
    val flatDir = s"/tmp/graft_probe_ivf_flat_$copies"
    // cluster by the partition key before the partitioned write — one
    // file per cell instead of (tasks × cells) fragments; at 100 TB
    // this is the standard hive-layout discipline (a partitioned
    // write without it produces a small-file explosion that costs
    // more to open than the pruning saves)
    assigned.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(partDir)
    assigned.write.mode("overwrite").parquet(flatDir)
    // queries route OUTSIDE the timed serve (real serving scores the
    // arriving vector against the k·d center literals on the driver —
    // no index scan): the timers below measure ONLY the corpus-side
    // search, pruned layout vs flat
    val panel = assigned.filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getLong(2))).toSeq
    val probed = panel.map(_._3).distinct.sorted
    println(s"probed_cells=${probed.size}/64")
    e2.unpersist(blocking = false)
    def serve(idx: org.apache.spark.sql.DataFrame): Unit = {
      import spark.implicits._
      val qs = broadcast(panel.toDF("q_id", "q_emb", "cell"))
      val sims = idx.filter(col("cell").isin(probed: _*))
        .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
          col("cell"))
        .join(qs, "cell")
        .filter(col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id"),
          graft.queries.VectorQueries.cosine(col("q_emb"), col("n_emb")).as("sim"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id").asc)
      sims.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .write.format("noop").mode("overwrite").save()
    }
    time("v45_serve_flat")(serve(spark.read.parquet(flatDir)))
    time("v45_serve_pruned")(serve(spark.read.parquet(partDir)))
    writeJson(outJson, copies)
    spark.stop()
  }

  /** p05_pretrain_build composition probe (round-6 verdict #6): the
    * end-to-end corpus build is gated at sf0.01 — this runs the SAME
    * composed plan at copies× by writing a scaled documents fixture
    * dir and pointing the gated builders at it. Records (a) each
    * stage standalone (t27 vetoes, t02 quality, d01 dedup keepers,
    * t09 decontam, the n_tok+cumsum tail), (b) the full composition,
    * and (c) the composed EXECUTED plan's parquet-scan and
    * ReusedExchange counts — evidence that Catalyst still shares the
    * corpus scan work across the five consumers in composition, so
    * composed wall ≪ Σ(standalone stages). */
  def p05Composition(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(100)
    val outJson = args.lift(1)
    val spark = session()
    val tmp = "/tmp/graft_p05x_fixture"
    scaled(spark, "documents", Seq("doc_id"), copies)
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val q = graft.queries.Registry.queries
    def leg(label: String, name: String): Unit =
      time(label) {
        q(name)(spark, tmp).write.format("noop").mode("overwrite").save()
      }
    // composed FIRST (cold page cache is shared fairly: the fixture
    // was just written), then each stage standalone. The BUILD is
    // inside the timer: globalCumsum's partition-offset pass executes
    // the whole upstream composition eagerly at build, so the heavy
    // work (scan → four filter joins → survivor exchange) happens
    // there, and the returned frame is a projection over the
    // materialized boundary.
    time("p05_composed") {
      val n = q("p05_pretrain_build")(spark, tmp).collect().length
      println(s"p05 survivors at ${copies}x: $n")
    }
    leg("stage_t27_c4", "t27_c4_filters")
    leg("stage_t02_quality", "t02_quality")
    leg("stage_d01_dedup", "d01_dedup_exact")
    leg("stage_t09_decontam", "t09_decontam")
    leg("stage_t11_pack", "t11_seq_pack")
    results("stages_sum") = math.rint(results.collect {
      case (k, v) if k.startsWith("stage_") => v }.sum * 100) / 100
    writeJson(outJson, copies)
    spark.stop()
  }

  /** Deliberately-skewed fact-fact join A/B (the q16 shape under a hot
    * orderkey): 30% of lineitem rows are remapped to ONE orderkey,
    * then the lineitem⋈orders join + revenue agg runs (a) with AQE
    * skew-join handling DISABLED — the hot key funnels through one
    * sort-merge task, the straggler — and (b) with it ENABLED
    * (thresholds sized to the probe data) — AQE re-splits the skewed
    * partition and replicates the matching orders rows. The JSON
    * records wall time AND the per-leg MAX task duration (the
    * straggler witness): the skew-handled plan must hold task-time
    * balance where the naive one cannot. A third pair pins WHY the
    * aggregation after the join is immune either way: sum/count
    * partials combine map-side, so even a hot GROUP key reaches the
    * final agg as ≤ #partitions partial rows (q29's Salting covers
    * the shapes where that isn't true). Legs interleave over two
    * rounds so box drift can't masquerade as a result. */
  def skewJoin(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.lift(1)
    val spark = session()
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null) {
          var cur = maxTaskMs.get
          while (te.taskInfo.duration > cur &&
            !maxTaskMs.compareAndSet(cur, te.taskInfo.duration))
            cur = maxTaskMs.get
        }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stageCount.incrementAndGet()
        taskMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
      }
    })
    // AQE skew thresholds sized to probe partitions (defaults target
    // 256 MB cluster partitions and would never fire here)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    val hot = 1L // orderkey 1 exists in the unshifted copy of orders
    val li = scaled(spark, "lineitem", Seq("l_orderkey"), copies)
      .withColumn("l_orderkey",
        when(pmod(col("l_orderkey"), lit(10)) < 3, lit(hot))
          .otherwise(col("l_orderkey")))
    val o = scaled(spark, "orders", Seq("o_orderkey"), copies)
    println(s"copies=$copies lineitem=${li.count()} orders=${o.count()}")

    def joinLeg(label: String, skewHandling: Boolean): Unit = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewHandling.toString)
      maxTaskMs.set(0)
      time(label) {
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
          .write.format("noop").mode("overwrite").save()
      }
      results(label + "_maxtasksec") =
        math.rint(maxTaskMs.get / 10.0) / 100.0
    }
    def aggLeg(label: String, salted: Boolean): Unit = {
      maxTaskMs.set(0)
      time(label) {
        val out =
          if (salted) graft.core.Salting.saltedSum(li, Seq(col("l_orderkey")),
            col("l_linenumber"), col("l_quantity"), buckets = 32, "q")
          else li.groupBy(col("l_orderkey")).agg(sum(col("l_quantity")).as("q"))
        out.write.format("noop").mode("overwrite").save()
      }
      results(label + "_maxtasksec") =
        math.rint(maxTaskMs.get / 10.0) / 100.0
    }
    joinLeg("warm_naive", skewHandling = false)
    for (round <- 1 to 2) {
      joinLeg(s"join_naive_$round", skewHandling = false)
      joinLeg(s"join_aqeskew_$round", skewHandling = true)
    }
    aggLeg("agg_plain", salted = false)
    aggLeg("agg_salted", salted = true)
    writeJson(outJson, copies)
    spark.stop()
  }

  /** Round-7 probes. (a) Wide correlation panels: k=32 forces
    * correlationMatrix's chunked block-pair shape (m=14 blocks ⇒ 6
    * cross-moment passes + 1 base pass, each aggregate ≤ 200 columns,
    * each scan ≤ 2m panel columns) — the k=4 fused single-agg x08 runs
    * alongside as the reference point. (b) Batched BPE training: same
    * 50 merges, maxBatch 1 vs 16 — the JSON records wall time AND the
    * driver round-trip counts, the thing batching actually buys. */
  /** Probes for the round-7 corpus-layout ops at `copies`×: the
    * shard addressing (t32) at 16 and 256 shards (shard count must
    * not change the plan shape — one hash exchange either way), the
    * source interleave (t33), and the physical saveShards write.
    * All are one-exchange window shapes, so sec/copy should hold
    * flat as copies grows. */
  def r7Layout(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.lift(1)
    val spark = session()
    val docs = scaled(spark, "documents", Seq("doc_id"), copies)
      .select(col("doc_id"), col("source"))
    println(s"copies=$copies docs=${docs.count()}")
    time("t32_shard16") {
      graft.queries.TextQueries.shardLayout(docs, 16)
        .write.format("noop").mode("overwrite").save()
    }
    time("t32_shard256") {
      graft.queries.TextQueries.shardLayout(docs, 256)
        .write.format("noop").mode("overwrite").save()
    }
    time("t33_interleave") {
      graft.queries.TextQueries.sourceInterleave(docs)
        .write.format("noop").mode("overwrite").save()
    }
    time("saveShards_write") {
      graft.sources.Sinks.saveShards(docs, "doc_id", 64,
        "/tmp/graft_probe_shards")
    }
    writeJson(outJson, copies)
    spark.stop()
  }

  /** Round-7 continuation probe: the newest operators at copies× —
    * t34 chunking (per-row explode, expect linear), e19 sliding
    * windows (2× row expansion into a hash agg, expect linear), the
    * x09 exact-vs-HLL grouped distinct A/B (the sketch's shuffle is
    * #groups-sized; the exact path expands (group, user) pairs — the
    * gap is the 100 TB argument for x09), and v22 k-means inertia
    * (fit + one narrow pass; centers are k·d driver doubles). */
  /** Round-8 operator probe: the new ops on copies× of sf0.1 —
    * binary quantization (v25), Hamming top-k (v26, fixed 5-query
    * panel vs a scaling corpus), the IVF streaming-assign pass (v28's
    * per-row fold on a batch frame), shingle novelty (t37), token
    * entropy (t38), Zipf slope (t39), rolling anomaly (e22), and the
    * weighted draw (x10). */
  def r8New(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.lift(1)
    val spark = session()
    // materialize the scaled frames (the p05Composition approach):
    // self-joining builders over an in-memory union trip Catalyst's
    // union-constraint rewrite, and a written fixture is the realistic
    // shape anyway
    val tmp = "/tmp/graft_r8new_fixture"
    scaled(spark, "embeddings", Seq("vec_id"), copies)
      .select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val emb = spark.read.parquet(s"$tmp/embeddings.parquet")
    println(s"embeddings=${emb.count()}")
    time("v25_binary_codes") {
      graft.queries.VectorQueries.binaryCodes(emb)
        .write.format("noop").mode("overwrite").save()
    }
    time("v26_hamming_topk") {
      graft.queries.VectorQueries.hammingTopk(emb, 10).collect()
    }
    val cents = graft.queries.VectorQueries.collectUpsertCentroids(spark, dir)
    time("v28_ivf_assign") {
      graft.streaming.StreamingOps.ivfAssign(
        emb.filter(col("vec_id") % 7 === 3), cents)
        .write.format("noop").mode("overwrite").save()
    }
    scaled(spark, "documents", Seq("doc_id"), copies)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val docs = spark.read.parquet(s"$tmp/documents.parquet")
    println(s"docs=${docs.count()}")
    time("t37_shingle_novelty") {
      graft.queries.TextQueries.shingleNovelty(docs.select(col("doc_id"), col("text")))
        .write.format("noop").mode("overwrite").save()
    }
    time("t38_token_entropy") {
      graft.queries.TextQueries.tokenEntropy(docs.select(col("doc_id"), col("text")))
        .write.format("noop").mode("overwrite").save()
    }
    time("t39_zipf_slope") {
      graft.queries.TextQueries.zipfSlope(docs.select(col("doc_id"), col("text"))).collect()
    }
    time("x10_weighted_sample") {
      graft.queries.ApproxQueries.weightedSample(
        docs.select(col("doc_id"), col("n_chars")), "n_chars", 100).collect()
    }
    time("t40_word_dispersion") {
      graft.queries.TextQueries.wordDispersion(
        docs.select(col("doc_id"), col("text"))).collect()
    }
    time("v29_kpp_seeds") {
      graft.queries.VectorQueries.kmeansppSeeds(emb, 4)
    }
    time("d17_band_sweep") {
      graft.queries.DedupQueries.bandSweepOf(
        graft.queries.DedupQueries.sigOf(
          docs.select(col("doc_id"), col("text")))).collect()
    }
    time("d18_dup_pagerank") {
      graft.queries.DedupQueries.dupPagerankOf(
        graft.queries.DedupQueries.candidatePairsOf(
          graft.queries.DedupQueries.sigOf(
            docs.select(col("doc_id"), col("text")))))
        .write.format("noop").mode("overwrite").save()
    }
    val ev = scaled(spark, "events", Seq("event_id", "user_id"), copies)
    println(s"events=${ev.count()}")
    time("x11_decayed_counts") {
      graft.queries.ApproxQueries.decayedCountsBatch(ev).collect()
    }
    time("e22_rolling_anomaly") {
      graft.queries.EventQueries.rollingAnomaly(ev)
        .write.format("noop").mode("overwrite").save()
    }
    // e23's as-of composition on a constant-user, scaling-event frame
    // (the skew-critical shape: per-user groups grow with copies)
    val ev23 = scaled(spark, "events", Seq("event_id"), copies)
    time("e23_bounded_funnel") {
      val views = ev23.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"))
      val clicks = ev23.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val qc = graft.operators.AsofJoin
        .backward(clicks, views, "user_id", "ts", Seq("ts"), prefix = "v_")
        .filter(col("v_ts").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("v_ts")) <= 3600L * 1000000L)
      qc.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    writeJson(outJson, copies)
    spark.stop()
  }

  /** Round-9 probe. Two questions:
    *
    * 1. CLEAN-fixture PageRank (VERDICT r8 Next #5): the r8New probe's
    *    15× super-linearity at 100× was the copies-fixture's quadratic
    *    EDGE growth (every doc gains ~copies near-identical twins), not
    *    the operator. Here each copy's minhash columns are salted with
    *    a copy-specific XOR, so LSH bands never collide ACROSS copies —
    *    duplication density stays the base fixture's, the corpus grows
    *    copies×, candidate edges grow ~linearly, and the probe isolates
    *    dupPagerank's own O(iters·edges) scaling.
    * 2. The broadcast-gather re-rank family at scale (the r9 fix):
    *    v31 Hamming re-rank and v33 IVF-PQ re-rank on a copies× corpus
    *    — the shortlist gather must stay a broadcast join, so cost
    *    tracks the codes scan, not a corpus shuffle.
    */
  def r9New(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.lift(1)
    val spark = session()
    val base = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val sigBase = graft.queries.DedupQueries.sigOf(base)
    val mhCols = sigBase.columns.filter(_.startsWith("mh"))
    val salted = (0 until copies).map { i =>
      mhCols.foldLeft(
        sigBase.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))(
        (df, c) => df.withColumn(c,
          col(c).bitwiseXOR(lit(i.toLong * 0x9E3779B97F4AL))))
    }.reduce(_ unionAll _)
    val tmp = "/tmp/graft_r9new_fixture"
    salted.write.mode("overwrite").parquet(s"$tmp/sig.parquet")
    val sig = spark.read.parquet(s"$tmp/sig.parquet")
    println(s"sig rows=${sig.count()}")
    val pairs = graft.queries.DedupQueries.candidatePairsOf(sig)
    pairs.write.mode("overwrite").parquet(s"$tmp/pairs.parquet")
    val edges = spark.read.parquet(s"$tmp/pairs.parquet")
    val nEdges = edges.count()
    println(s"candidate edges=$nEdges (expect ~copies x base)")
    results("d18_edges") = nEdges.toDouble
    time("d18_pagerank_clean") {
      graft.queries.DedupQueries.dupPagerankOf(edges)
        .write.format("noop").mode("overwrite").save()
    }
    // deeper-than-gated iteration count exercises the cutEvery lineage
    // discipline on a real scaled edge set
    time("d18_pagerank_clean_it8") {
      graft.queries.DedupQueries.dupPagerankOf(edges, iters = 8)
        .write.format("noop").mode("overwrite").save()
    }
    scaled(spark, "embeddings", Seq("vec_id"), copies)
      .select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val emb = spark.read.parquet(s"$tmp/embeddings.parquet")
    println(s"embeddings=${emb.count()}")
    time("v31_hamming_rerank") {
      graft.queries.VectorQueries.hammingRerank(emb, 20, 5).collect()
    }
    time("v33_ivfpq_rerank") {
      graft.queries.VectorQueries.ivfPqRerank(emb, 20, 5).collect()
    }
    // p12's grouped cumsum: driver state is O(sources × partitions)
    // offsets — constant here while the per-source doc count scales
    // (docs materialized to parquet so each consumer scans a real
    // file, not the copies-way union plan)
    scaled(spark, "documents", Seq("doc_id"), copies)
      .select(col("doc_id"), col("source"), col("text"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val docs = spark.read.parquet(s"$tmp/documents.parquet")
    time("p12_token_budget_mix") {
      graft.queries.PipelineQueries.tokenBudgetMix(docs, 800L)
        .write.format("noop").mode("overwrite").save()
    }
    // t42: the histogram/CDF stays ≤ 101·sources rows at every copies
    // level — wall should track the two corpus scans, nothing else
    time("t42_quality_calibration") {
      graft.queries.TextQueries.sourceQualityCalibration(docs)
        .write.format("noop").mode("overwrite").save()
    }
    // v36: the label predicate shrinks the codes scan ~10× before any
    // distance math — filtered wall should sit well UNDER v31's
    // (materialized to parquet first, same footing as the v31 fixture,
    // so the probe times the operator, not the 100-way union scan)
    scaled(spark, "embeddings", Seq("vec_id"), copies)
      .select(col("vec_id"), col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings_l.parquet")
    val embL = spark.read.parquet(s"$tmp/embeddings_l.parquet")
    time("v36_filtered_rerank") {
      graft.queries.VectorQueries.filteredHammingRerank(embL, 20, 5).collect()
    }
    // p13: the composed curation chain (calibrate ∩ canonical → mix);
    // the costly stage is d19's LSH+CC over the scaled docs — the
    // calibration and mix stages ride the same two corpus scans
    time("p13_calibrated_mix") {
      graft.queries.PipelineQueries.calibratedMix(docs, 500L)
        .write.format("noop").mode("overwrite").save()
    }
    // same composition with the SALTED-signature pairs injected (edge
    // growth linear in copies by construction — the d18 pattern):
    // isolates the chain's own scaling from the copies-fixture's
    // quadratic LSH-pair artifact inside d19
    time("p13_calibrated_mix_cleanpairs") {
      graft.queries.PipelineQueries.calibratedMix(docs, 500L,
          pairsOpt = Some(edges))
        .write.format("noop").mode("overwrite").save()
    }
    // e24: every exchange is keyed on a frame that only shrinks
    // (events → user-weeks → users); user_id scales with copies so
    // the user-week frame grows linearly, not degenerately
    val ev = scaled(spark, "events", Seq("event_id", "user_id"), copies)
    time("e24_retention_cohorts") {
      graft.queries.EventQueries.retentionCohortsOf(ev)
        .write.format("noop").mode("overwrite").save()
    }
    writeJson(outJson, copies)
    spark.stop()
  }

  /** Late round-9 additions: outlier scoring (v39), drift PSI (x14),
    * snapshot diff (d20), epoch plan (p14), fertility (t44), pack
    * sweep (t45). Fixtures materialized to parquet so each probe
    * scans a real file, not the copies-way union plan. */
  def r9Late(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.lift(1)
    val spark = session()
    val tmp = "/tmp/graft_r9late_fixture"
    scaled(spark, "embeddings", Seq("vec_id"), copies)
      .select(col("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val emb = spark.read.parquet(s"$tmp/embeddings.parquet")
    println(s"embeddings=${emb.count()}")
    // v39: k-means fit (collected k·d centers) + one codegen'd scan +
    // a 20-row TakeOrdered — wall should track the Lloyd scans
    time("v39_centroid_outliers") {
      graft.queries.VectorQueries.centroidOutliersOf(emb).collect()
    }
    // x14: two narrow scans into two ≤48-row aggregates; the PSI math
    // never grows with the corpus
    time("x14_embedding_drift") {
      graft.queries.ApproxQueries.embeddingDrift(
        emb.filter(col("vec_id") % 2 === 0).select(col("embedding")),
        emb.filter(col("vec_id") % 2 === 1).select(col("embedding")))
        .collect()
    }
    scaled(spark, "documents", Seq("doc_id"), copies)
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        col("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val docs = spark.read.parquet(s"$tmp/documents.parquet")
    println(s"docs=${docs.count()}")
    // d20: two fingerprint scans + fp-keyed aggs + the fp full join —
    // the one genuinely shuffling probe here, linear in the corpus
    time("d20_snapshot_diff") {
      graft.queries.DedupQueries.snapshotDiff(
        docs.filter(col("doc_id") % 3 =!= 0)
          .select(col("text"), col("n_chars")),
        docs.filter(col("doc_id") % 3 =!= 1)
          .select(col("text"), col("n_chars"))).collect()
    }
    // p14/t44: one tokenizing scan each into a k-row keyed agg
    time("p14_epoch_plan") {
      graft.queries.PipelineQueries.epochPlan(
        docs.select(col("source"), col("text")), 1000000L).collect()
    }
    time("t44_token_fertility") {
      graft.queries.TextQueries.tokenFertility(
        docs.select(col("lang"), col("text"))).collect()
    }
    // t45: the whole size sweep on ONE two-phase cumsum
    time("t45_pack_efficiency") {
      graft.queries.TextQueries.packEfficiency(
        docs.select(col("doc_id"), col("text")),
        Seq(256L, 512L, 1024L)).collect()
    }
    // v40: the probe-cell candidate frame grows linearly with the
    // corpus (cells hold corpus/k vectors); every probe level beyond
    // the sims is a rank window over candidates only
    scaled(spark, "embeddings", Seq("vec_id"), copies)
      .select(col("vec_id"), col("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings_l.parquet")
    val embL = spark.read.parquet(s"$tmp/embeddings_l.parquet")
    time("v40_nprobe_sweep") {
      graft.queries.VectorQueries.nprobeSweepOf(embL).collect()
    }
    // t46: two t42-shaped histogram passes + PSI math on the
    // ≤101·sources counter frame
    time("t46_quality_drift") {
      graft.queries.TextQueries.qualityDrift(
        docs.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("source"), col("text")),
        docs.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("source"), col("text"))).collect()
    }
    // m05: narrow decode-stage mapPartitions + two keyed aggs
    time("m05_media_phash_dedup") {
      implicit val sp: SparkSession = spark
      graft.operators.Multimodal.perceptualHash(
        graft.operators.Multimodal.mediaFromDocuments(docs)).toDF()
        .groupBy(col("kind"), col("phash"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .groupBy(col("kind"))
        .agg(org.apache.spark.sql.functions.sum(col("n")).as("n_media"))
        .collect()
    }
    writeJson(outJson, copies)
    spark.stop()
  }

  def r7New(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.lift(1)
    val spark = session()
    val docs = scaled(spark, "documents", Seq("doc_id"), copies)
      .select(col("doc_id"), col("text"))
    println(s"docs=${docs.count()}")
    time("t34_chunking") {
      graft.queries.TextQueries.docChunks(docs)
        .write.format("noop").mode("overwrite").save()
    }
    val ev = scaled(spark, "events", Seq("event_id", "user_id"), copies)
    println(s"events=${ev.count()}")
    time("e19_sliding") {
      graft.queries.EventQueries.slidingCounts(ev)
        .write.format("noop").mode("overwrite").save()
    }
    time("x09_exact_distinct") {
      ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("nd")).collect()
    }
    time("x09_hll_distinct") {
      ev.groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("nd")).collect()
    }
    time("t35_code_signals") {
      graft.queries.TextQueries.codeSignals(docs)
        .write.format("noop").mode("overwrite").save()
    }
    time("t36_sentence_stats") {
      val sents = org.apache.spark.sql.functions.filter(
        transform(split(col("text"), "[.!?]+"), x => trim(x)),
        x => length(x) > 0)
      docs.select(col("doc_id"),
        org.apache.spark.sql.functions.size(sents).cast("long").as("n_sents"),
        coalesce(array_max(transform(sents, x => length(x))), lit(0))
          .cast("long").as("max_sent_chars"))
        .write.format("noop").mode("overwrite").save()
    }
    val emb = scaled(spark, "embeddings", Seq("vec_id"), copies)
      .select(col("vec_id"), col("embedding"))
    println(s"embeddings=${emb.count()}")
    time("v22_inertia") {
      graft.queries.VectorQueries.kmeansInertia(emb).collect()
    }
    time("v23_balanced") {
      graft.queries.VectorQueries.balancedSample(emb)
        .write.format("noop").mode("overwrite").save()
    }
    writeJson(outJson, copies)
    spark.stop()
  }

  def r7Ops(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.lift(1)
    val spark = session()
    val li = scaled(spark, "lineitem", Seq("l_orderkey"), copies)
    println(s"copies=$copies lineitem=${li.count()}")
    val base4 = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    // 32-column panel: the 4 real measures + 28 cheap derived mixes
    // (performance shape is what's probed; values don't matter)
    val derivedNames = (0 until 28).map(i => s"c$i")
    val derived = (0 until 28).foldLeft(li) { (df, i) =>
      df.withColumn(s"c$i",
        col("l_extendedprice") * lit(i % 7 + 1) +
          col("l_quantity") * lit(i % 5 - 2) +
          pmod(col("l_orderkey") * lit(2654435761L + i), lit(997 + i))
            .cast("double"))
    }
    time("x08_corr_k4_fused") {
      graft.queries.ApproxQueries.correlationMatrix(li, base4).collect()
    }
    time("x08_corr_k32_chunked") {
      val n = graft.queries.ApproxQueries
        .correlationMatrix(derived, base4 ++ derivedNames).count()
      require(n == 32 * 31 / 2, s"expected 496 pairs, got $n")
    }
    val docs = scaled(spark, "documents", Seq("doc_id"), copies)
      .select(col("doc_id"), col("text"))
    println(s"docs=${docs.count()}")
    var seqRounds = 0
    var batRounds = 0
    var locRounds = 0
    time("bpe_train50_seq") {
      seqRounds = graft.operators.Bpe
        .trainWithStats(docs, "text", 50, maxBatch = 1,
          localVocabThreshold = 0)._2
    }
    time("bpe_train50_batch16") {
      batRounds = graft.operators.Bpe
        .trainWithStats(docs, "text", 50, maxBatch = 16,
          localVocabThreshold = 0)._2
    }
    // the production path: ONE vocab aggregation + in-memory training
    // (the vocab is Heaps-bounded however big the corpus gets); at a
    // production 50k-merge vocabulary the gap vs per-merge cluster
    // rounds is 50k jobs vs 1
    time("bpe_train50_local") {
      locRounds = graft.operators.Bpe
        .trainWithStats(docs, "text", 50)._2
    }
    results("bpe_rounds_seq") = seqRounds.toDouble
    results("bpe_rounds_batch16") = batRounds.toDouble
    results("bpe_rounds_local") = locRounds.toDouble
    writeJson(outJson, copies)
    spark.stop()
  }

  /** Probes for the round-6 continuation operators. (a) e14 native
    * session windows: Spark's merging-session aggregation after one
    * user_id exchange — state is O(open sessions), the probe watches
    * the merge stay linear in events. (b) e15 gaps: e13's window
    * shape + k-row agg. (c) t30 lexical diversity: the two-level
    * vocab agg — the (doc_id, token) key never hot, partials combine
    * map-side. (d) t31 token shape: zero-exchange per-row algebra,
    * the linearity floor. (e) x08: one-pass global moments. */
  def r6New(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.lift(1)
    val spark = session()
    val ev = scaled(spark, "events", Seq("event_id", "user_id"), copies)
    val nEv = ev.count()
    val docs = scaled(spark, "documents", Seq("doc_id"), copies)
      .select(col("doc_id"), col("text"))
    val nDoc = docs.count()
    val li = scaled(spark, "lineitem", Seq("l_orderkey"), copies)
    val nLi = li.count()
    println(s"copies=$copies events=$nEv docs=$nDoc lineitem=$nLi")
    time("e14_session_window") {
      graft.queries.EventQueries.sessionWindows(ev)
        .write.format("noop").mode("overwrite").save()
    }
    time("e15_interevent_gaps") {
      graft.queries.EventQueries.interEventGaps(ev)
        .write.format("noop").mode("overwrite").save()
    }
    time("t30_lexical_diversity") {
      graft.queries.TextQueries.lexicalDiversity(docs)
        .write.format("noop").mode("overwrite").save()
    }
    time("t31_token_shape") {
      docs.select(col("doc_id"),
        size(filter(split(col("text"), graft.functions.TextFunctions.Ws),
          t => length(t) > lit(0)))
          .cast("long").as("n_tok"))
        .write.format("noop").mode("overwrite").save()
    }
    time("x08_correlation") {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      li.agg(count(lit(1)).as("n"),
        (cols.map(c => graft.core.Det.dsum(col(c)).as(s"s_$c")) ++
          cols.combinations(2).map { case Seq(a, b) =>
            graft.core.Det.dsum(col(a) * col(b)).as(s"sp_${a}_$b")
          }.toSeq): _*)
        .write.format("noop").mode("overwrite").save()
    }
    writeJson(outJson, copies,
      s""", "events": $nEv, "docs": $nDoc, "lineitem": $nLi""")
    spark.stop()
  }

  /** Probes for the shapes restored by the round-6 NTZ fix: e02's
    * sessions window (one user_id exchange, lag + keyed agg) and
    * p04's user-360 composition (sessions + userFirsts sharing the
    * user_id exchange, funnel stage + cohort derived in the same
    * plan). Linear per user history; nothing global. */
  def r6Fix(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.lift(1)
    val spark = session()
    val ev = scaled(spark, "events", Seq("event_id", "user_id"), copies)
    val nEv = ev.count()
    println(s"copies=$copies events=$nEv")
    time("e02_sessions") {
      graft.queries.EventQueries.sessions(ev)
        .write.format("noop").mode("overwrite").save()
    }
    time("p04_user_report") {
      val sess = graft.queries.EventQueries.sessions(ev)
      val firsts = graft.queries.EventQueries.userFirsts(ev)
      sess.join(firsts, "user_id")
        .select(col("user_id"), col("n_sessions"), col("n_events"),
          graft.queries.EventQueries.funnelStage.as("funnel_stage"),
          col("cohort"))
        .write.format("noop").mode("overwrite").save()
    }
    writeJson(outJson, copies, s""", "events": $nEv""")
    spark.stop()
  }

  /** Probes for the round-5 continuation operators at `copies`×.
    * (a) t28 Gopher rules + t29 n-gram char fractions: explode +
    * keyed aggs, linear; t29's 5-gram explode is the heaviest text
    * shape added this round. (b) e13 transitions: one user_id window
    * exchange + a k²-row agg, linear per user history. (c) d15
    * containment: Σ_g nd(g)² pair generation — the capped gram join —
    * with copies multiplying every cluster's size, the superlinear
    * risk this probe exists to watch. (d) v18 MIPS: broadcast 5
    * queries against a scaling candidate side, linear. */
  def r5New(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.lift(1)
    val spark = session()
    val docs = scaled(spark, "documents", Seq("doc_id"), copies)
      .select(col("doc_id"), col("text"))
    val nDoc = docs.count()
    val ev = scaled(spark, "events", Seq("event_id", "user_id"), copies)
    val nEv = ev.count()
    val vecs = scaled(spark, "embeddings", Seq("vec_id"), copies)
      .select(col("vec_id"), col("embedding"))
    val nVec = vecs.count()
    println(s"copies=$copies docs=$nDoc events=$nEv vecs=$nVec")
    time("t28_gopher_rules") {
      graft.queries.TextQueries.gopherRules(docs)
        .write.format("noop").mode("overwrite").save()
    }
    time("t29_dup_ngram_chars") {
      graft.queries.TextQueries.dupNgramChars(docs)
        .write.format("noop").mode("overwrite").save()
    }
    time("e13_event_transitions") {
      graft.queries.EventQueries.transitions(ev)
        .write.format("noop").mode("overwrite").save()
    }
    var d15Pairs = 0L
    time("d15_containment") {
      d15Pairs = graft.queries.DedupQueries.containment(docs).count()
    }
    time("v18_mips_topk") {
      graft.queries.VectorQueries.mipsTopk(vecs)
        .write.format("noop").mode("overwrite").save()
    }
    writeJson(outJson, copies,
      s""", "docs": $nDoc, "events": $nEv, "vectors": $nVec, "d15_pairs": $d15Pairs""")
    spark.stop()
  }

  /** Round-6 operator probes at `copies`×. (a) d14 winnowing: per-row
    * selection + one fp-keyed exchange — the fp count should hold near
    * 40% of grams while cost stays linear; (b) t27 C4 filters: one
    * explode + keyed agg, linear; (c) v17 JL projection: one narrow
    * codegen'd pass, the cheapest shape in the repo — any superlinear
    * move here would mean a broken plan, not a slow operator. */
  def r6Ops(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.lift(1)
    val spark = session()
    val docs = scaled(spark, "documents", Seq("doc_id"), copies)
      .select(col("doc_id"), col("text"))
    val nDoc = docs.count()
    val vecs = scaled(spark, "embeddings", Seq("vec_id"), copies)
      .select(col("vec_id"), col("embedding"))
    val nVec = vecs.count()
    println(s"copies=$copies docs=$nDoc vecs=$nVec")
    time("d14_winnowing") {
      graft.queries.DedupQueries.winnowing(docs)
        .write.format("noop").mode("overwrite").save()
    }
    time("t27_c4_filters") {
      graft.queries.TextQueries.c4Filters(docs)
        .write.format("noop").mode("overwrite").save()
    }
    time("v17_random_projection") {
      graft.queries.VectorQueries.randomProjection(vecs)
        .write.format("noop").mode("overwrite").save()
    }
    writeJson(outJson, copies, s""", "docs": $nDoc, "vectors": $nVec""")
    spark.stop()
  }

  /** t26 at `copies`× documents: two keyed aggregations plus the
    * per-doc left join back to documents — should scale linearly (the
    * line-key agg is bounded by per-doc line counts, never corpus
    * cross terms). */
  def lineRepProbe(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.lift(1)
    val spark = session()
    val dirTables = scaled(spark, "documents", Seq("doc_id"), copies)
    val nDoc = dirTables.count()
    println(s"copies=$copies docs=$nDoc")
    time("t26_line_repetition") {
      // mirror the registry query's plan on the scaled frame
      val docs = dirTables.select(col("doc_id"), col("text"))
      val lines = docs
        .select(col("doc_id"), explode(split(col("text"), "\n")).as("line"))
        .filter(length(trim(col("line"))) > 0)
      val agg = lines.groupBy(col("doc_id"), col("line"))
        .agg(count(lit(1)).as("c"), length(col("line")).as("len"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_lines"),
          sum(col("c") * col("len")).as("n_chars"),
          sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dup_lines"),
          sum(when(col("c") > 1, col("c") * col("len"))
            .otherwise(lit(0L))).as("dup_chars"))
      docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
        .write.format("noop").mode("overwrite").save()
    }
    writeJson(outJson, copies, s""", "docs": $nDoc""")
    spark.stop()
  }

  /** d13 eval probe at `copies`× documents. Exact ground truth is
    * inherently pair-quadratic inside shingle buckets, so the eval is
    * DESIGNED to run on a hash-sample: with sampleMod = copies the
    * sample stays constant-size as the corpus grows, and eval cost
    * should stay flat — the property that makes LSH tuning affordable
    * at any corpus size. The unsampled run at base scale anchors the
    * cost the sample avoids. */
  def lshEvalProbe(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.lift(1)
    val spark = session()
    val docs = scaled(spark, "documents", Seq("doc_id"), copies)
      .select(col("doc_id"), col("text"))
    val nDoc = docs.count()
    println(s"copies=$copies docs=$nDoc")
    var sampled: Long = -1L
    time(s"d13_eval_sampled") {
      val r = graft.queries.DedupQueries.lshEval(docs, sampleMod = copies.toLong)
        .collect()(0)
      sampled = r.getLong(0) // n_true — proves the sample isn't empty
    }
    writeJson(outJson, copies, s""", "docs": $nDoc, "sample_n_true": $sampled""")
    spark.stop()
  }

  /** t25 quality-classifier probe at `copies`× documents: train is
    * MLlib L-BFGS — one treeAggregate gradient pass per iteration, so
    * the scale question is (a) does the iteration count stay flat as
    * the corpus grows (it should: same distribution, just more rows)
    * and (b) is per-iteration cost linear. Score is a narrow codegen'd
    * fold — linearity is the only check. */
  def classifierProbe(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.lift(1)
    val spark = session()
    val docs = scaled(spark, "documents", Seq("doc_id"), copies)
      .select(col("doc_id"), col("text"))
    val nDoc = docs.count()
    println(s"copies=$copies docs=$nDoc")
    import graft.operators.QualityClassifier
    var model: org.apache.spark.ml.classification.LogisticRegressionModel = null
    time("t25_train") {
      model = QualityClassifier.train(docs, QualityClassifier.lengthLabel())
    }
    val iters = model.summary.totalIterations
    println(s"iterations=$iters")
    time("t25_score") {
      QualityClassifier.score(model, docs)
        .select(col("doc_id"), col("margin_n"))
        .write.format("noop").mode("overwrite").save()
    }
    writeJson(outJson, copies, s""", "docs": $nDoc, "lbfgs_iterations": $iters""")
    spark.stop()
  }

  /** The economic case for incremental dedup (d11): at `copies`×
    * documents, probing a 10% NEW batch against the standing corpus's
    * band index (broadcast batch, corpus streams once) vs recomputing
    * the full all-pairs candidate set — the cost a pipeline pays every
    * crawl drop without an incremental path. The full recompute's pair
    * join grows with corpus×corpus bucket co-occupancy; the probe
    * grows with corpus×batch. */
  def incDedup(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.lift(1)
    val spark = session()
    val docs = scaled(spark, "documents", Seq("doc_id"), copies)
    val nDocs = docs.count()
    println(s"copies=$copies docs=$nDocs")
    def bandsOf(d: DataFrame): DataFrame = {
      val sig = graft.queries.DedupQueries.sigOf(d) // doc_id, mh0..mh7
      sig.select(col("doc_id"), explode(array((0 until 4).map(j =>
        struct(lit(j).as("band"),
          ((col(s"mh${2 * j}") * lit(31L) +
            col(s"mh${2 * j + 1}")) % lit(P)).as("bkey"))): _*)).as("b"))
        .select(col("doc_id"), col("b.band").as("band"), col("b.bkey").as("bkey"))
    }
    val isNew = col("doc_id") % 10 === 9
    var fullPairs = 0L; var probed = 0L
    time("full_recompute_pairs") {
      fullPairs = graft.queries.DedupQueries
        .candidatePairsOf(graft.queries.DedupQueries.sigOf(docs)).count()
    }
    time("incremental_probe") {
      val bands = bandsOf(docs)
      probed = bands.filter(!isNew)
        .join(broadcast(bands.filter(isNew).withColumnRenamed("doc_id", "new_id")),
          Seq("band", "bkey"))
        .groupBy("new_id").agg(countDistinct(col("doc_id")).as("n_cands"))
        .count()
    }
    writeJson(outJson, copies,
      s""", "docs": $nDocs, "full_pairs": $fullPairs, "batch_docs_probed": $probed""")
    spark.stop()
  }

  /** 10× probe of the continuation operators: DSIR importance weights
    * (two word-keyed aggs + broadcast-back), BM25 (postings filtered
    * before any shuffle), SQ encode + embedding normalization (d-row
    * stats broadcast, per-vec agg), running window aggs (one keyed
    * exchange). Confirms each stays roughly linear — the shapes have
    * no pair joins, so the risk is a silent broadcast flip or agg
    * skew, which the timings would show superlinearly. */
  def newOps(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.lift(1)
    val spark = session()
    val docs = scaled(spark, "documents", Seq("doc_id"), copies)
      .select(col("doc_id"), col("lang"), col("text"))
    val nDoc = docs.count()
    println(s"copies=$copies docs=$nDoc")
    time("t20_importance_weights") {
      graft.queries.TextQueries.importanceWeights(docs)
        .write.format("noop").mode("overwrite").save()
    }
    time("t21_bm25") {
      graft.queries.TextQueries.bm25(docs, Seq("spark", "window", "join"))
        .write.format("noop").mode("overwrite").save()
    }
    val vecs = scaled(spark, "embeddings", Seq("vec_id"), copies)
      .select(col("vec_id"), col("embedding"))
    time("v14_sq_codes") {
      graft.queries.VectorQueries.sqCodes(vecs)
        .write.format("noop").mode("overwrite").save()
    }
    time("v15_embed_normalize") {
      graft.queries.VectorQueries.embedNormalize(vecs)
        .write.format("noop").mode("overwrite").save()
    }
    val ev = scaled(spark, "events", Seq("event_id", "user_id"), copies)
    time("e06_running_aggs") {
      graft.queries.EventQueries.runningAggs(ev)
        .write.format("noop").mode("overwrite").save()
    }
    // bigram family (word/bigram-keyed aggs; totals now derived from
    // the aggregated tables, not extra tokenize passes)
    time("t24_pmi") {
      graft.queries.TextQueries.pmiCollocations(docs)
        .write.format("noop").mode("overwrite").save()
    }
    // BPE: train once on the BASE corpus (the vocab-side fixed cost —
    // merges don't change with corpus copies), then time the native
    // codegen'd encode over the scaled corpus, which is the step a
    // 100 TB tokenization pipeline actually scales
    val merges = graft.operators.Bpe.train(
      Tables(spark, dir, "documents").select(col("doc_id"), col("text")),
      "text", 50)
    time("bpe_encode") {
      docs.select(col("doc_id"),
          graft.operators.Bpe.encode(col("text"), merges).as("toks"))
        .write.format("noop").mode("overwrite").save()
    }
    writeJson(outJson, copies, s""", "docs": $nDoc""")
    spark.stop()
  }

  /** Same-JVM A/B: the interpreted HOF shingle chain vs the native
    * ShinglesExpr on the d09/d10 shape (16-gram explode + count).
    * Interleaved twice so JVM warmth cancels. */
  def shingleAb(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.lift(1)
    val spark = session()
    import graft.functions.TextFunctions._
    val docs = scaled(spark, "documents", Seq("doc_id"), copies)
      .select(col("doc_id"), col("text"))
    for (round <- 1 to 2) {
      time(s"hof_16gram_r$round") {
        docs.select(explode(shinglesFromHashesHof(tokenHashes(col("text")), 16)).as("g"))
          .agg(count(lit(1))).collect()
      }
      time(s"native_16gram_r$round") {
        docs.select(explode(shinglesFromHashes(tokenHashes(col("text")), 16)).as("g"))
          .agg(count(lit(1))).collect()
      }
    }
    writeJson(outJson, copies)
    spark.stop()
  }

  /** Round-4 operator probes. (a) As-of join at `copies`× events with
    * user count held CONSTANT (event ids shifted, user ids not), so
    * per-user history deepens — the regime where the naive
    * range-join+max goes quadratic per group while the union+window
    * form stays linear. (b) PQ fused encode over `copies`× vectors —
    * one narrow pass, should scale linearly. */
  def r4Ops(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.lift(1)
    val spark = session()
    val ev = scaled(spark, "events", Seq("event_id"), copies)
    val nEv = ev.count()
    println(s"copies=$copies events=$nEv")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    time("asof_union_window") {
      graft.operators.AsofJoin
        .backward(clicks, purchases, "user_id", "ts", Seq("ts", "value"),
          tiebreak = None)
        .write.format("noop").mode("overwrite").save()
    }
    time("asof_naive_rangejoin") {
      // the shape AsofJoin.backward exists to avoid: per-key partial
      // cartesian (clicks × earlier purchases), then max_by per click
      clicks.as("l")
        .join(purchases.as("r"),
          col("l.user_id") === col("r.user_id") && col("r.ts") <= col("l.ts"))
        .groupBy(col("l.event_id"))
        .agg(max_by(struct(col("r.ts"), col("r.value")), col("r.ts")).as("m"))
        .write.format("noop").mode("overwrite").save()
    }
    val vecs = scaled(spark, "embeddings", Seq("vec_id"), copies)
      .select(col("vec_id"), col("embedding"))
    val nVec = vecs.count()
    time("pq_encode_fused") {
      graft.queries.VectorQueries.pqCodes(vecs, dim = 64)
        .write.format("noop").mode("overwrite").save()
    }
    writeJson(outJson, copies, s""", "events": $nEv, "vectors": $nVec""")
    spark.stop()
  }

  /** 100× probe of the heaviest 10× tail: the d07 dedup-clusters
    * pipeline (LSH candidates → connected components). Confirms the
    * round count stays O(log diameter) and per-row cost stays
    * sub-linear as copies grow — the two claims the operator's scale
    * design rests on. */
  def ccProbe(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(100)
    val outJson = args.lift(1)
    val spark = session()
    val docs = scaled(spark, "documents", Seq("doc_id"), copies)
    val nDocs = docs.count()
    println(s"copies=$copies docs=$nDocs")
    var rounds = 0
    var vertices = 0L
    var pairCount = 0L
    time("lsh_candidate_pairs") {
      pairCount = graft.queries.DedupQueries
        .candidatePairsOf(graft.queries.DedupQueries.sigOf(docs)).count()
    }
    time("dedup_cc_end_to_end") {
      val pairs = graft.queries.DedupQueries
        .candidatePairsOf(graft.queries.DedupQueries.sigOf(docs))
      val (cc, r) = graft.core.ConnectedComponents.runCounted(pairs, "doc_a", "doc_b")
      rounds = r
      vertices = cc.count()
    }
    writeJson(outJson, copies,
      s""", "docs": $nDocs, "candidate_pairs": $pairCount, "cc_rounds": $rounds, "cc_vertices": $vertices""")
    spark.stop()
  }

  /** Same-JVM A/B of the hot-bucket guard's benign-path overhead:
    * candidate generation through BucketGuard vs the raw unguarded
    * self-join, interleaved twice each so machine drift cancels.
    * (Standalone probe runs vary ±40% run-to-run on this box — only a
    * same-session interleave isolates the guard's own cost.) */
  def abGuard(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.lift(1)
    val spark = session()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stageCount.incrementAndGet()
        taskMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
      }
    })
    val vecs = scaled(spark, "embeddings", Seq("vec_id"), copies)
      .select(col("vec_id"), col("embedding"))
    println(s"copies=$copies vecs=${vecs.count()}")

    def guarded(): Unit = {
      graft.queries.VectorQueries.bandedCandidates(vecs, planes = 16, bands = 4)
        .write.format("noop").mode("overwrite").save()
    }
    def raw(): Unit = {
      val keyed = vecs.select(col("vec_id"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            graft.queries.VectorQueries.lshBucket(col("embedding"), 16, b * 16).as("bkey"))): _*)).as("bb"))
        .select(col("vec_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
      keyed.as("l").join(keyed.as("r"),
          col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
            col("l.vec_id") =!= col("r.vec_id"))
        .select(col("l.vec_id").as("q_id"), col("r.vec_id").as("n_id"))
        .distinct()
        .write.format("noop").mode("overwrite").save()
    }
    // warm both, then interleave
    raw(); guarded()
    for (round <- 1 to 2) {
      time(s"raw_$round")(raw())
      time(s"guarded_$round")(guarded())
    }
    writeJson(outJson, copies)
    spark.stop()
  }

  /** The heaviest 10× probe (join_agg_fact_fact) head-to-head at big
    * copy counts: the per-query shuffle path vs the pay-once bucketed
    * path. At 100 TB the fact-fact join is THE cost center; bucketing
    * both fact tables on the join key at ingest turns every subsequent
    * join into a co-located sort-merge with no exchange (BucketingSpec
    * pins the plan shape). This probe measures that trade at ~sf10
    * (60M lineitem rows at 100 copies): one bucketed write, then the
    * same join+agg through both paths. */
  def factJoin(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(100)
    val outJson = args.lift(1)
    val spark = session()
    val warehouse = java.nio.file.Files
      .createTempDirectory("graft_bucketed").toString

    val li = scaled(spark, "lineitem", Seq("l_orderkey"), copies)
    val o = scaled(spark, "orders", Seq("o_orderkey", "o_custkey"), copies)
    val liRows = li.count(); val oRows = o.count()
    println(s"copies=$copies  lineitem=$liRows  orders=$oRows")

    def joinAgg(l: DataFrame, r: DataFrame): Unit =
      l.join(r, l("l_orderkey") === r("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(Det.dsum(col("l_extendedprice")))
        .write.format("noop").mode("overwrite").save()

    time("join_agg_shuffle")(joinAgg(li, o))

    // Pay the shuffle once at write time: both sides hash-bucketed and
    // sorted on the join key into the same bucket count.
    time("bucket_write_both") {
      Bucketing.writeBucketed(li, "li_b", "l_orderkey", 32, warehouse)
      Bucketing.writeBucketed(o, "o_b", "o_orderkey", 32, warehouse)
    }
    time("join_agg_bucketed") {
      joinAgg(Bucketing.table(spark, "li_b"), Bucketing.table(spark, "o_b"))
    }
    // Amortization: a second run through each path (steady state — the
    // bucketed advantage repeats every query, the write cost doesn't).
    time("join_agg_shuffle_2nd")(joinAgg(li, o))
    time("join_agg_bucketed_2nd") {
      joinAgg(Bucketing.table(spark, "li_b"), Bucketing.table(spark, "o_b"))
    }

    val perMRowShuffle = results("join_agg_shuffle_2nd") / (liRows / 1e6)
    val perMRowBucketed = results("join_agg_bucketed_2nd") / (liRows / 1e6)
    println(f"per-1M-rows: shuffle $perMRowShuffle%.3f s, bucketed $perMRowBucketed%.3f s")
    writeJson(outJson, copies,
      s""", "lineitem_rows": $liRows, "sec_per_1m_rows": {"shuffle": ${math.rint(perMRowShuffle * 1000) / 1000}, "bucketed": ${math.rint(perMRowBucketed * 1000) / 1000}}""")

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warehouse))
    spark.stop()
  }

  def standard(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.lift(1)
    val spark = session()

    val li = scaled(spark, "lineitem", Seq("l_orderkey"), copies)
    val o = scaled(spark, "orders", Seq("o_orderkey", "o_custkey"), copies)
    val docs = scaled(spark, "documents", Seq("doc_id"), copies)
    val vecs = scaled(spark, "embeddings", Seq("vec_id"), copies)
    println(s"copies=$copies  lineitem=${li.count()}  docs=${docs.count()}")

    time("agg_q09") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(Det.dsum(col("l_quantity")), count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    time("join_agg_fact_fact") {
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(Det.dsum(col("l_extendedprice")))
        .write.format("noop").mode("overwrite").save()
    }
    time("minhash_sig_d02") {
      // production shape: native token_hashes + fused shingle_minhash
      docs.select(col("doc_id"),
          graft.functions.TextHashExprs.token_hashes(col("text")).as("th"))
        .select(col("doc_id"),
          graft.functions.TextHashExprs.shingle_minhash(col("th"), 3, 8).as("sig"))
        .write.format("noop").mode("overwrite").save()
    }
    time("lsh_pairs_d03") {
      val sig = docs.select(col("doc_id"),
          graft.functions.TextHashExprs.token_hashes(col("text")).as("th"))
        .select(col("doc_id"),
          graft.functions.TextHashExprs.shingle_minhash(col("th"), 3, 8).as("sig"))
      val bands = sig.select(col("doc_id"), explode(array((0 until 4).map(j =>
        struct(lit(j).as("band"),
          ((element_at(col("sig"), 2 * j + 1) * lit(31L) +
            element_at(col("sig"), 2 * j + 2)) % lit(P)).as("bkey"))): _*)).as("b"))
        .select(col("doc_id"), col("b.band").as("band"), col("b.bkey").as("bkey"))
      bands.as("l").join(bands.as("r"),
          col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
            col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id"), col("r.doc_id")).distinct()
        .write.format("noop").mode("overwrite").save()
    }
    time("row_number_scanorder") {
      // the inc() shape: zipWithIndex two-phase, no single-task window
      RowNumbers.scanOrder(li.select(col("l_orderkey")), "rn")
        .write.format("noop").mode("overwrite").save()
    }
    time("dedup_cc_d07") {
      // the d07 tail: connected components over the LSH candidate
      // pairs (iterative — includes every propagation round + the
      // convergence checks), then the per-cluster keeper join
      val pairs = graft.queries.DedupQueries
        .candidatePairsOf(graft.queries.DedupQueries.sigOf(docs))
      val cc = graft.core.ConnectedComponents.run(pairs, "doc_a", "doc_b")
      println(s"  cc labeled vertices: ${cc.count()}")
    }
    time("ann_banded_candidates") {
      // candidate generation at 10× vectors: finer buckets (16 planes)
      // as n grows — the knob the parameterization exists for
      val n = graft.queries.VectorQueries
        .bandedCandidates(vecs.select(col("vec_id"), col("embedding")),
          planes = 16, bands = 4)
        .count()
      println(s"  ann candidates: $n")
    }

    writeJson(outJson, copies)
    spark.stop()
  }
}
