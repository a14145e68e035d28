package graft.queries

import org.apache.hadoop.fs.{Path => HPath}

import graft.SparkSpec
import graft.operators.IvfIndex

/** Property pins for the round-15 concurrency hardening of the
  * sidecar CAS:
  *  - retention must never sweep a FUTURE-version shard file (a
  *    concurrent writer's commit in flight — its shards land before
  *    its header CAS), only aged ones (crashed writers) and retired
  *    committed generations;
  *  - a reader resolving DURING a sharded commit sees wholly the old
  *    generation or wholly the new one — never a mix — and a
  *    committed header whose shards vanish fails LOUDLY after the
  *    bounded re-resolve, never returning partial cells.
  */
class R15OpsSpec extends SparkSpec {

  private def fs(path: String) =
    new HPath(path).getFileSystem(spark.sessionState.newHadoopConf())

  private def wipe(p: String): Unit = {
    val d = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.isDirectory(d)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }

  private def plant(path: String, name: String,
      ageMs: Long = 0L): HPath = {
    val f = fs(path)
    val p = new HPath(path + "/" + IvfIndex.SidecarDir, name)
    val out = f.create(p, true)
    try out.write("x".getBytes) finally out.close()
    if (ageMs > 0)
      f.setTimes(p, System.currentTimeMillis() - ageMs, -1)
    p
  }

  private def tinySidecar(version: Long, mark: Double) = IvfIndex.Sidecar(
    serving = Seq(0 -> Array(1.0, mark)),
    refresh = Seq(0 -> Array(1.0, mark)),
    counts = Map(0L -> 1L), staleCells = Set.empty,
    pendingAppends = false, maxSeq = 0L, version = version)

  test("retention keeps an in-flight writer's future-version shards") {
    // the ADVICE r14 race: writer B (read version N) lands its
    // cells-*.v{N+1} shards, then writer A's commit of version N runs
    // retention — the old rule deleted any shard version outside the
    // two newest COMMITTED generations, which includes B's in-flight
    // N+1; B's header CAS then succeeded against deleted shards,
    // leaving the index unreadable. New rule: a shard version PAST
    // the max committed header survives unless aged (crashed-writer
    // sweep), and committed-but-retired versions still retire.
    val path = "/tmp/graft_r15_retention"
    wipe(path)
    val f = fs(path)
    IvfIndex.writeSidecar(spark, path, tinySidecar(1L, 1.0))
    // in-flight concurrent writer: fresh shards for a FUTURE version
    val inflight = plant(path, "cells-0.aaaaaaaa.v4")
    // crashed writer: future-version shards older than the 1h guard
    val crashed = plant(path, "cells-0.bbbbbbbb.v9", ageMs = 2 * 3600 * 1000L)
    // old-generation shard: version 1 stays kept after v2 (two newest)
    val gen1 = plant(path, "cells-0.cccccccc.v1")
    IvfIndex.writeSidecar(spark, path, tinySidecar(2L, 2.0))
    assert(f.exists(inflight),
      "a fresh future-version shard is an in-flight commit — retention must keep it")
    assert(!f.exists(crashed),
      "an AGED future-version shard is a crashed writer's orphan — swept")
    assert(f.exists(gen1), "v1 is still among the two newest committed")
    // one more commit retires generation 1 entirely
    IvfIndex.writeSidecar(spark, path, tinySidecar(3L, 3.0))
    assert(!f.exists(gen1),
      "a retired committed generation's shards must be swept")
    assert(f.exists(inflight),
      "the in-flight shard (v4 > max committed 3) must still survive")
    assert(IvfIndex.readSidecar(spark, path).get.serving.head._2(1) == 3.0)
  }

  test("reader during a sharded commit sees wholly-old or wholly-new, never a mix") {
    // two sharded sidecars (>SidecarShardCells cells) with
    // distinguishable values; v2's files are copied into the index
    // dir in the commit's own order (shards first, header last) with
    // a read at every interleaving point.
    val k = 5000 // > SidecarShardCells (4096) -> 2 binary shard files
    def bigSidecar(version: Long, mark: Double) = IvfIndex.Sidecar(
      serving = (0 until k).map(c => c -> Array(c.toDouble, mark)),
      refresh = (0 until k).map(c => c -> Array(c.toDouble, mark)),
      counts = (0 until k).map(c => c.toLong -> 1L).toMap,
      staleCells = Set.empty, pendingAppends = false, maxSeq = 0L,
      version = version)
    val path = "/tmp/graft_r15_wholeness"
    val stage = "/tmp/graft_r15_wholeness_stage"
    wipe(path); wipe(stage)
    IvfIndex.writeSidecar(spark, path, bigSidecar(1L, 1.0))
    // stage version 2 in a scratch dir (same writer code path), then
    // replay its files into the live dir in commit order
    IvfIndex.writeSidecar(spark, stage, bigSidecar(2L, 2.0))
    val f = fs(path)
    val stageDir = new HPath(stage, IvfIndex.SidecarDir)
    val liveDir = new HPath(path, IvfIndex.SidecarDir)
    val staged = f.listStatus(stageDir).map(_.getPath.getName).sorted
    val v2shards = staged.filter(_.startsWith("cells-")).filter(_.endsWith(".v2"))
    val v2header = staged.find(_ == "centers.v2").get
    assert(v2shards.length == 2, s"expected 2 shards, got ${v2shards.toSeq}")
    def copyIn(name: String): Unit =
      org.apache.hadoop.fs.FileUtil.copy(f, new HPath(stageDir, name),
        f, new HPath(liveDir, name), false,
        spark.sessionState.newHadoopConf())
    def marks(): Set[Double] = {
      val sc = IvfIndex.readSidecar(spark, path).get
      assert(sc.serving.length == k, "reads must always be whole")
      sc.serving.map(_._2(1)).toSet
    }
    // shards half-landed: still wholly v1
    copyIn(v2shards(0))
    assert(marks() == Set(1.0), "half-written v2 shards must stay invisible")
    // all shards landed, header not yet: still wholly v1
    copyIn(v2shards(1))
    assert(marks() == Set(1.0), "uncommitted v2 shards must stay invisible")
    // header CAS lands: wholly v2, never a v1/v2 mix
    copyIn(v2header)
    assert(marks() == Set(2.0), "a committed header must resolve its own shards")
    // a committed header whose shard vanishes (over-eager retention /
    // manual damage) must fail LOUDLY after the bounded re-resolve —
    // never return partial cells or silently fall back to v1
    f.delete(new HPath(liveDir, v2shards(1)), false)
    val err = intercept[IllegalStateException] {
      IvfIndex.readSidecar(spark, path)
    }
    assert(err.getMessage.contains("vanish"),
      s"expected the loud vanish-retry diagnostic, got: ${err.getMessage}")
  }
}
