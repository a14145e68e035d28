package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Gate for the model-based quality scorer (t25): L-BFGS training has
  * no SQL oracle, so the operator's defining properties are pinned —
  * held-out discrimination, bit-identical refits, probability bounds. */
class QualityClassifierSpec extends SparkSpec {

  private lazy val docs = Tables(spark, sf0001, "documents")
    .select(col("doc_id"), col("lang"), col("text"))
  // weak label the model distills — the SAME definition t25 runs
  // (QualityClassifier.lengthLabel), so the spec always gates the
  // query's configuration. (The fixture's lang column is independent
  // of its 31-token vocabulary by construction, so language is NOT
  // learnable from text — length is.)
  private val weak = QualityClassifier.lengthLabel()

  test("held-out accuracy separates the weak label well above chance") {
    val model = QualityClassifier.train(
      docs.filter(col("doc_id") % 2 === 0), weak)
    val scored = QualityClassifier
      .score(model, docs.filter(col("doc_id") % 2 === 1))
      .withColumn("y", weak)
    val (hit, n) = scored
      .select(((col("quality_p") >= 0.5) === col("y")).as("ok"))
      .collect().map(_.getBoolean(0))
      .foldLeft((0, 0)) { case ((h, t), ok) => (h + (if (ok) 1 else 0), t + 1) }
    val acc = hit.toDouble / n
    assert(acc >= 0.8, s"held-out accuracy $acc ($hit/$n)")
  }

  test("training is deterministic: two fits produce identical coefficients") {
    val train = docs.filter(col("doc_id") % 2 === 0)
    val a = QualityClassifier.train(train, weak)
    val b = QualityClassifier.train(train, weak)
    assert(a.coefficients.toArray.sameElements(b.coefficients.toArray))
    assert(a.intercept == b.intercept)
  }

  test("scores are probabilities and preserve the input's row set") {
    val half = docs.filter(col("doc_id") % 2 === 1)
    val model = QualityClassifier.train(
      docs.filter(col("doc_id") % 2 === 0), weak)
    val rows = QualityClassifier.score(model, half).collect()
    assert(rows.length == half.count())
    assert(rows.forall { r =>
      val p = r.getDouble(r.fieldIndex("quality_p")); p >= 0.0 && p <= 1.0
    })
  }

  test("quality_p is the sigmoid of the exact integer margin") {
    val model = QualityClassifier.train(
      docs.filter(col("doc_id") % 2 === 0), weak)
    val rows = QualityClassifier
      .score(model, docs.filter(col("doc_id") % 2 === 1)).collect()
    assert(rows.forall { r =>
      val m = r.getLong(r.fieldIndex("margin_n"))
      val p = r.getDouble(r.fieldIndex("quality_p"))
      math.abs(p - 1.0 / (1.0 + math.exp(-m / QualityClassifier.WeightScale))) < 1e-12 &&
        ((p >= 0.5) == (m >= 0))
    })
  }

  // The t25 oracle scores with QualityWeights' FROZEN per-SF
  // snapshots while the gated query scores with a fresh fit — this
  // pin catches any training drift from a snapshot, with a readable
  // message, before it can redden the driver's hash gate (or the
  // cross-SF sweep, which since round 10 carries no t25 exception).
  test("retraining reproduces the frozen nano-weights at every fixture SF") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1").foreach { dir =>
      val docs = Tables(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val key = docs.agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.octet_length(col("text")).cast("long")))
        .head.getLong(0)
      val snap = QualityWeights.snapshots.find(_.key == key)
        .getOrElse(fail(s"no frozen snapshot for $dir (key=$key) — " +
          "rerun FreezeQualityWeights over all fixture SFs"))
      val model = QualityClassifier.train(
        docs.filter(col("doc_id") % 2 === 0), weak)
      val (wq, bq) = QualityClassifier.quantize(model)
      assert(bq == snap.bq,
        s"$dir: intercept drifted: $bq vs frozen ${snap.bq} — rerun FreezeQualityWeights")
      val diff = wq.indices.filter(i => wq(i) != snap.wq(i))
      assert(diff.isEmpty,
        s"$dir: ${diff.length} weights drifted (first at bucket " +
          s"${diff.headOption.getOrElse(-1)}) — rerun FreezeQualityWeights")
    }
  }
}
