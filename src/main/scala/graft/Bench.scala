package graft

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Per-round benchmark: times the headline queries (Registry bench
  * flag) on SPARK_GRAFT_SF_DIR and prints ONE JSON line. Results are
  * materialized through the noop sink so projection/compute isn't
  * pruned away by a count-only plan; one untimed warm-up pass absorbs
  * JVM/codegen/IO-cache warmup. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bench = Registry.benchQueries
    def materialize(name: String): Unit =
      Registry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // warm-up (untimed); per-query guard so one failure can't abort
    // the round's benchmark before the JSON line prints
    bench.foreach(q => try materialize(q.name) catch { case _: Throwable => () })

    val results = bench.map { q =>
      val t0 = System.nanoTime()
      try materialize(q.name)
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
      }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
