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
}
