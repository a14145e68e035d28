package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Model-based quality filtering — the classifier stage of the
  * CCNet/GPT-3-style curation recipe: score every document by a
  * linear model over hashed token features, trained against a weak
  * label (here: "looks like the target distribution"). At 100 TB this
  * is THE way quality filtering is actually run: heuristics (t02)
  * gate the worst, a cheap linear scorer ranks the rest.
  *
  * Scale shape: featurization hashes the shared TextFunctions
  * tokenizer's polynomial token hash into `NumFeatures` buckets — a
  * stateless hash, no vocab broadcast, no fitting; training is
  * MLlib's standard distributed L-BFGS (one treeAggregate gradient
  * pass over the corpus per iteration — map-side partials, driver
  * state is just the d-dim coefficient vector); scoring is a
  * codegen'd higher-order fold per row (no UDF, no shuffle).
  *
  * Cross-engine determinism (the t25 oracle): trained coefficients
  * are quantized to integer NANO-weights (`quantize`), and the score
  * margin is then an all-integer fold — bq + Σ wq[tokenHash(tok) mod
  * NumFeatures] — exact, order-independent, and reproducible in any
  * engine that can hash tokens the same way (OracleSql.tokenHash is
  * the DuckDB mirror). The sigmoid is monotone in the margin, so
  * keep/rank decisions carry over; `quality_p` is display-only.
  * Deterministic training: zero-initialized coefficients, fixed hash
  * space, no sampling anywhere — two fits on the same data produce
  * bit-identical coefficients (pinned in QualityClassifierSpec).
  */
object QualityClassifier {
  /** Hashed feature space. 1024 keeps the frozen-weight literal table
    * (QualityWeights — embedded in the t25 oracle SQL) compact while
    * leaving ~1 bucket per 30 fixture vocab words; collisions just
    * blend weights, as in any hashing-trick classifier. */
  val NumFeatures = 1024

  /** Coefficients are frozen at 1e-9 resolution — far below any
    * decision-relevant signal, large enough that a BIGINT margin over
    * million-token documents cannot overflow (1e9 · |w|≈10 · 1e6
    * tokens ≈ 1e16 < 2^63). */
  val WeightScale = 1e9

  // columns the featurize/score pipeline writes — an input frame
  // carrying any of them would make MLlib throw a confusing
  // duplicate-column AnalysisException mid-pipeline, so fail early
  private val ReservedCols = Set("features", "__label",
    "rawPrediction", "probability", "prediction", "margin_n", "quality_p")
  private def checkReserved(docs: DataFrame): Unit = {
    val clash = docs.columns.toSet.intersect(ReservedCols)
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} are reserved by QualityClassifier")
  }

  /** The demo weak label (used by t25 AND its spec — one definition so
    * the spec always gates the configuration the query runs): the
    * length heuristic at the fixture's median token count. `textCol`
    * must match the one passed to train/score. Real pipelines swap in
    * whatever weak signal they have. */
  def lengthLabel(threshold: Int = 56, textCol: String = "text"): Column =
    size(TextFunctions.tokens(col(textCol))) >= threshold

  /** Narrow featurize for TRAINING: graft token hashes → sparse count
    * vectors. The UDF is confined to the training pass (read once per
    * L-BFGS fit); the 100 TB scoring path is the pure-expression
    * `marginNano` fold below. */
  def featurize(docs: DataFrame, textCol: String = "text"): DataFrame = {
    checkReserved(docs)
    val toVec = udf { (hs: Seq[Long]) =>
      val counts = new Array[Double](NumFeatures)
      hs.foreach(h => counts((h % NumFeatures).toInt) += 1.0)
      Vectors.dense(counts).toSparse
    }
    docs.withColumn("features",
      toVec(TextFunctions.tokenHashes(col(textCol))))
  }

  /** Fit a logistic scorer of `label` (0/1 column) over hashed token
    * features. */
  def train(docs: DataFrame, label: Column, textCol: String = "text",
      maxIter: Int = 30, regParam: Double = 0.01): LogisticRegressionModel =
    new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("__label")
      .fit(featurize(docs, textCol).withColumn("__label", label.cast("double")))

  /** Trained coefficients + intercept as integer nano-weights — the
    * exact representation both engines score with. */
  def quantize(model: LogisticRegressionModel): (Array[Long], Long) = {
    require(model.coefficients.size == NumFeatures,
      s"model has ${model.coefficients.size} features, expected $NumFeatures")
    (model.coefficients.toArray.map(c => Math.rint(c * WeightScale).toLong),
      Math.rint(model.intercept * WeightScale).toLong)
  }

  /** Exact integer margin in nano-units: bq + Σ wq[tokenHash(tok) mod
    * NumFeatures], as a codegen'd `aggregate` fold over the token-hash
    * array — order-independent (integer addition), so any partitioning
    * or engine produces the identical BIGINT. Empty docs fold to bq. */
  def marginNano(textCol: Column, wq: Array[Long], bq: Long): Column = {
    val wqArr = typedLit(wq)
    aggregate(TextFunctions.tokenHashes(textCol), lit(bq),
      (acc, h) => acc + element_at(wqArr, (h % NumFeatures).cast("int") + 1))
  }

  /** Score documents: exact `margin_n` plus the display probability
    * P(label = 1) = sigmoid(margin_n / WeightScale), appended per row. */
  def score(model: LogisticRegressionModel, docs: DataFrame,
      textCol: String = "text"): DataFrame = {
    checkReserved(docs)
    val (wq, bq) = quantize(model)
    docs
      .withColumn("margin_n", marginNano(col(textCol), wq, bq))
      .withColumn("quality_p", lit(1.0) /
        (lit(1.0) + exp(-col("margin_n").cast("double") / lit(WeightScale))))
  }
}
