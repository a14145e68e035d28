package graft.operators

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the classifier stage of the
  * CCNet/GPT-3-style curation recipe: score every document by a
  * linear model over hashed token features, trained against a weak
  * label (here: "looks like the target distribution"). At 100 TB this
  * is THE way quality filtering is actually run: heuristics (t02)
  * gate the worst, a cheap linear scorer ranks the rest.
  *
  * Scale shape: featurization is a narrow per-row pass (shared
  * TextFunctions.tokens → HashingTF, a stateless hash — no vocab
  * broadcast, no fitting); training is MLlib's standard distributed
  * L-BFGS (one treeAggregate gradient pass over the corpus per
  * iteration — map-side partials, driver state is just the d-dim
  * coefficient vector); scoring is the model's BLAS dot per row.
  * Deterministic: zero-initialized coefficients, fixed hash space,
  * no sampling anywhere — two fits on the same data produce
  * bit-identical coefficients (pinned in QualityClassifierSpec).
  */
object QualityClassifier {
  val NumFeatures = 4096

  // columns the featurize/score pipeline writes — an input frame
  // carrying any of them would make MLlib throw a confusing
  // duplicate-column AnalysisException mid-pipeline, so fail early
  private val ReservedCols = Set("features", "__toks", "__label",
    "rawPrediction", "probability", "prediction", "quality_p")
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
    size(graft.functions.TextFunctions.tokens(col(textCol))) >= threshold

  /** Narrow featurize: hashed token-count vectors. */
  def featurize(docs: DataFrame, textCol: String = "text"): DataFrame = {
    checkReserved(docs)
    val toks = docs.withColumn("__toks",
      graft.functions.TextFunctions.tokens(col(textCol)))
    new HashingTF().setInputCol("__toks").setOutputCol("features")
      .setNumFeatures(NumFeatures).transform(toks).drop("__toks")
  }

  /** Fit a logistic scorer of `label` (0/1 column) over hashed token
    * features. */
  def train(docs: DataFrame, label: Column, textCol: String = "text",
      maxIter: Int = 30, regParam: Double = 0.01): LogisticRegressionModel =
    new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("__label")
      .fit(featurize(docs, textCol).withColumn("__label", label.cast("double")))

  /** Score documents: P(label = 1) per row, appended as `quality_p`. */
  def score(model: LogisticRegressionModel, docs: DataFrame,
      textCol: String = "text"): DataFrame = {
    val scored = model.transform(featurize(docs, textCol))
    val p1 = element_at(vector_to_array(col(model.getProbabilityCol)), 2)
    scored.select(docs.columns.map(col) :+ p1.as("quality_p"): _*)
  }
}
