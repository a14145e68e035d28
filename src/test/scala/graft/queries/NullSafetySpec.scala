package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Null/degenerate-text behavior of the per-row text operators. The
  * parquet fixtures carry no null text, but the dialect reads user
  * CSVs where empty fields ARE null — a chunker or profiler that
  * throws on the first null row is unusable on real data. Contract:
  * null-text rows never crash a builder; they either drop out (row
  * generators like chunking) or carry null/zero stats. */
class NullSafetySpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    Seq((1L, "alpha beta gamma"), (2L, null.asInstanceOf[String]),
      (3L, ""), (4L, "   "), (5L, "solo"))
      .toDF("doc_id", "text")
  }

  test("docChunks drops null/empty/blank docs and keeps the rest") {
    val out = TextQueries.docChunks(docs, 4, 1).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 5L),
      "only docs with at least one token may emit chunks")
  }

  test("codeSignals emits a row per doc without throwing on null text") {
    val out = TextQueries.codeSignals(docs).collect()
    assert(out.length == 5)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // null text: stats null, keep must resolve (not throw, not null)
    assert(byId(2L).isNullAt(3) && !byId(2L).isNullAt(5))
    assert(byId(2L).getLong(5) == 0L, "null text must not be kept")
    assert(byId(1L).getLong(5) == 1L, "normal prose passes the keep rule")
  }

  test("seqPack treats null/empty text as zero tokens, not a crash") {
    val out = TextQueries.seqPack(docs, 4L).collect()
    assert(out.length == 5)
    val byId = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(2L) == 0L && byId(3L) == 0L && byId(4L) == 0L)
    assert(byId(1L) == 3L && byId(5L) == 1L)
  }

  test("content-signature expressions never throw on null text") {
    import graft.functions.TextFunctions._
    val out = docs.select(col("doc_id"),
      tokens(col("text")).as("tk"),
      docFingerprint(col("text")).as("fp"),
      simhash(tokenHashes(col("text"))).as("sh"),
      langIdNative(col("text")).as("lang"))
      .collect()
    assert(out.length == 5, "every row must survive, null text included")
    // null in → null (or a defined neutral) out; no exceptions is the contract
  }

  test("hashSample and trainSplit ignore the text column entirely") {
    assert(TextQueries.hashSample(docs, 100L, 100L).count() == 5)
    val sp = TextQueries.trainSplit(docs.select(col("doc_id")), 80L, 10L)
    assert(sp.filter("split is null").count() == 0)
  }

  test("round-9 builders tolerate null text: fertility, pack sweep, epoch plan, " +
      "snapshot diff, perceptual hash") {
    val d = docs.withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
      .withColumn("n_chars", coalesce(length(col("text")).cast("long"), lit(0L)))
    // keyed aggregates: null text carries null/zero stats, never throws
    assert(TextQueries.tokenFertility(d.select(col("lang"), col("text")))
      .collect().length == 1)
    assert(TextQueries.packEfficiency(d.select(col("doc_id"), col("text")),
      Seq(4L)).collect().length == 1)
    assert(PipelineQueries.epochPlan(d.select(col("source"), col("text")),
      100L).collect().length == 1)
    // fp-keyed diff: null fingerprints group like any key
    assert(DedupQueries.snapshotDiff(
      d.filter(col("doc_id") % 3 =!= 0).select(col("text"), col("n_chars")),
      d.filter(col("doc_id") % 3 =!= 1).select(col("text"), col("n_chars")))
      .collect().nonEmpty)
    // null payload = empty bytes -> phash 0, no NPE
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val ph = graft.operators.Multimodal.perceptualHash(
      graft.operators.Multimodal.mediaFromDocuments(d)).collect()
    assert(ph.length == 5)
    assert(ph.find(_.doc_id == 2L).get.phash == 0L)
  }

  test("tokenBudgetMix / calibratedMix treat null text as zero tokens") {
    val d = docs.withColumn("source", lit("s"))
      .select(col("doc_id"), col("source"), col("text"))
    val mix = PipelineQueries.tokenBudgetMix(d, 100L).collect()
    assert(mix.length == 5, "every row survives, null text included")
    val byId = mix.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(byId(2L) == 0L && byId(3L) == 0L, "null/empty text = 0 tokens")
    assert(mix.forall(_.getLong(4) == 1L), "tiny corpus fits the budget")
    // the full p13 composition (calibration + canonical pick + mix)
    assert(PipelineQueries.calibratedMix(d, 100L).collect()
      .forall(r => !r.isNullAt(3)))
  }

  test("epochPlan reports 0 epochs (not NaN→MaxEpochs) for an all-null source") {
    val d = docs.withColumn("source",
      when(col("doc_id") === 2L, lit("empty")).otherwise(lit("s")))
      .filter(col("doc_id") =!= 3L && col("doc_id") =!= 4L)
    val out = PipelineQueries.epochPlan(
      d.select(col("source"), col("text")), 100L).collect()
    val empty = out.find(_.getString(0) == "empty").get
    assert(empty.getLong(1) == 0L)
    assert(empty.getDouble(3) == 0.0,
      "0-token source must plan 0 epochs, not NaN or MaxEpochs")
  }

  test("perceptualHash rejects bit widths past the 30-bit gram hash") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val m = graft.operators.Multimodal.mediaFromDocuments(
      docs.withColumn("source", lit("s")))
    intercept[IllegalArgumentException] {
      graft.operators.Multimodal.perceptualHash(m, bits = 31)
    }
  }
}
