package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Det, RowNumbers, Tables}
import graft.functions.TextFunctions._

/** Scaling probe: unions key-shifted copies of sf0.1 in-memory (~sf1:
  * 6M lineitem rows, 50k docs, 500k vectors at 10×) and times the
  * heaviest operator shapes, so "would this hold at 10×?" is measured,
  * not guessed. Results land in SCALE_r{N}.json (second arg). Run:
  *   sbt "runMain graft.ScaleProbe [copies] [outJson]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val outJson = args.lift(1)
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def scaled(name: String, keyCols: Seq[String]): DataFrame = {
      val base = Tables(spark, dir, name)
      val shift = 10000000L
      (0 until copies).map { i =>
        keyCols.foldLeft(base)((df, k) =>
          df.withColumn(k, col(k) + lit(i * shift)))
      }.reduce(_ unionAll _)
    }

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      results(label) = math.rint(sec * 100) / 100
      println(f"$label%-28s $sec%8.2f s")
    }

    val li = scaled("lineitem", Seq("l_orderkey"))
    val o = scaled("orders", Seq("o_orderkey", "o_custkey"))
    val docs = scaled("documents", Seq("doc_id"))
    val vecs = scaled("embeddings", Seq("vec_id"))
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
    time("ann_banded_candidates") {
      // candidate generation at 10× vectors: finer buckets (16 planes)
      // as n grows — the knob the parameterization exists for
      val n = graft.queries.VectorQueries
        .bandedCandidates(vecs.select(col("vec_id"), col("embedding")),
          planes = 16, bands = 4)
        .count()
      println(s"  ann candidates: $n")
    }

    outJson.foreach { p =>
      val probes = results.map { case (k, v) => s""""$k": $v""" }.mkString(", ")
      val json =
        s"""{"copies": $copies, "sf_base": 0.1, "probes": {$probes}}"""
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n")
      println(s"wrote $p")
    }
    spark.stop()
  }
}
