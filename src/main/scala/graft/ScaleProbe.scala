package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Det, Tables}
import graft.functions.TextFunctions._

/** Scaling probe: unions key-shifted copies of sf0.1 in-memory (~sf1:
  * 6M lineitem rows, 50k docs) and times the heaviest operator shapes,
  * so "would this hold at 10×?" is measured, not guessed. Run:
  *   sbt "runMain graft.ScaleProbe [copies]"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
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

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val li = scaled("lineitem", Seq("l_orderkey"))
    val o = scaled("orders", Seq("o_orderkey", "o_custkey"))
    val docs = scaled("documents", Seq("doc_id"))
    println(s"copies=$copies  lineitem=${li.count()}  docs=${docs.count()}")

    time("agg (q09 shape)") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(Det.dsum(col("l_quantity")), count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    time("join+agg (fact-fact)") {
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(Det.dsum(col("l_extendedprice")))
        .write.format("noop").mode("overwrite").save()
    }
    time("minhash sig (d02 shape)") {
      docs.select(col("doc_id"), tokenHashes(col("text")).as("th"))
        .select(col("doc_id"), shinglesFromHashes(col("th"), 3).as("sh"))
        .select(col("doc_id"), minhashSigFold(col("sh"), 8).as("sig"))
        .write.format("noop").mode("overwrite").save()
    }
    time("lsh pairs (d03 shape)") {
      val sig = docs.select(col("doc_id"), tokenHashes(col("text")).as("th"))
        .select(col("doc_id"), shinglesFromHashes(col("th"), 3).as("sh"))
        .select(col("doc_id"), minhashSigFold(col("sh"), 8).as("sig"))
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
    spark.stop()
  }
}
