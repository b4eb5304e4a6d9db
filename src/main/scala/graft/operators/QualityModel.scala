package graft.operators

import graft.Tables
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LEARNED quality gate: a fastText-style linear classifier over hashed
  * bag-of-words features — the standard architecture of LLM-corpus
  * quality filters (CCNet / GPT-3 / LLaMA data pipelines train exactly
  * this shape: cheap hashed features, a linear model, a probability
  * cutoff). Here it is self-supervised by DISTILLING the rule-based
  * Gopher gate ([[TextAnalysis.gopherRules]]) into a model: rule
  * verdicts become weak labels, and the trained scorer generalizes the
  * battery of hand rules into one smooth score (the practical pattern
  * when scaling rules to domains where they misfire).
  *
  * Scale shape: featurization is a map pass (tokenize → hashingTF,
  * dim=1024 sparse vectors — no vocabulary build, no shuffle); MLlib
  * LogisticRegression aggregates gradient partials driver-side per
  * L-BFGS step (model = dim-sized, constant); scoring is again one map
  * pass. Nothing materializes the corpus more than once per iteration,
  * and the model broadcast is KBs at any corpus size. Training is
  * bounded by `maxIter`; the fit is deterministic for a fixed input
  * (deterministic init, exact line search over partial-agg'd losses).
  *
  * Model internals are engine-specific → rows-only check + a spec
  * asserting the distilled model beats the majority-class baseline at
  * reproducing the rule verdicts.
  */
object QualityModel {

  /** Hashed-BoW featurizer shared by batch fit and stream scoring. */
  private def featurizer(numFeatures: Int): HashingTF = new HashingTF()
    .setInputCol("tokens").setOutputCol("features").setNumFeatures(numFeatures)

  /** Fit the distilled gate on a (doc_id, text) corpus; returns the
    * trained model (dim-sized — broadcastable anywhere, including into
    * a streaming query).
    */
  def fit(docs: DataFrame, numFeatures: Int = 1024, maxIter: Int = 25,
          regParam: Double = 0.01)
      : org.apache.spark.ml.classification.LogisticRegressionModel = {
    val feat = featurizer(numFeatures).transform(
      docs.select(col("doc_id"), split(col("text"), " ").as("tokens"),
        TextAnalysis.gopherPassExpr(minWords = 15).cast("double").as("label")))
      .cache()
    new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(feat)
  }

  /** Batch scoring. `model = null` (default) fits fresh on this corpus;
    * passing a pre-fitted model scores with EXACTLY that model — the
    * batch/stream parity contract ([[scoreStream]]) is then equality by
    * construction rather than by hoping two independent L-BFGS runs
    * aggregate bit-identically.
    */
  def qualityScore(s: SparkSession, d: String, numFeatures: Int = 1024,
                   maxIter: Int = 25, regParam: Double = 0.01,
                   model: org.apache.spark.ml.classification.LogisticRegressionModel = null)
      : DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        split(col("text"), " ").as("tokens"),
        TextAnalysis.gopherPassExpr(minWords = 15).cast("double").as("label"))
    val feat = featurizer(numFeatures).transform(docs).cache()
    val m = if (model != null) model else new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(feat)
    m.transform(feat)
      .select(col("doc_id"), col("label").cast("long").as("rule_label"),
        round(vector_to_array(col("probability"))(1), 4).as("quality_score"),
        col("prediction").cast("long").as("pred"))
      .orderBy("doc_id")
  }

  /** STREAMING model inference: score an unbounded (doc_id, text)
    * stream with a pre-fitted quality model — the online admission gate
    * of a continuously-ingesting corpus (the micro-batch twin of
    * [[qualityScore]]'s batch scoring, and the learned upgrade of the
    * rule gates in CuratePipeline). Featurize + model.transform are
    * both row-local map work, so the scored stream needs NO state
    * store, no watermark, and no shuffle — the model rides to
    * executors as a broadcast KB-sized coefficient vector however
    * large the stream.
    */
  def scoreStream(docStream: DataFrame,
                  model: org.apache.spark.ml.classification.LogisticRegressionModel,
                  numFeatures: Int = 1024): DataFrame =
    model.transform(featurizer(numFeatures).transform(
        docStream.select(col("doc_id"), split(col("text"), " ").as("tokens"))))
      .select(col("doc_id"),
        round(vector_to_array(col("probability"))(1), 4).as("quality_score"),
        col("prediction").cast("long").as("pred"))
}
