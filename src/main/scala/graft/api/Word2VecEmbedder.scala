package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** REAL trained text encoder behind the [[Embedder]] seam — MLlib
  * Word2Vec (skip-gram, Mikolov et al. 2013), trained fully
  * in-container on the corpus itself. This is the honest stand-in for
  * the reference's e5-large pooler (QdrantCloud.py:20-22): a LEARNED
  * distributional model whose vectors place words by context — a
  * synonym query retrieves a paraphrase document that shares ZERO
  * surface tokens with it, which the feature-hash default can never do
  * (no shared token ⇒ cosine 0). Document embedding = mean of word
  * vectors (`Word2VecModel.transform`'s averaging), the classic
  * bag-of-vectors sentence encoder.
  *
  * Determinism contract ([[Embedder]]): the model is FITTED ONCE and
  * the fitted weights are immutable, so `embed` is deterministic by
  * construction; training itself pins seed + numPartitions = 1 (the
  * documented MLlib determinism condition — Hogwild-parallel training
  * with more partitions trades reproducibility for speed, the 100-TB
  * knob). The trained model is vocab × dim floats — driver/executor
  * model state in the centroid size class, broadcast by MLlib's own
  * transform.
  */
class Word2VecEmbedder private (
    val model: org.apache.spark.ml.feature.Word2VecModel) extends Embedder {

  override def embed(docs: DataFrame): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    model.transform(docs.withColumn("__words", split(col("text"), " ")))
      .select(col("doc_id"), vector_to_array(col("__vec")).as("embedding"))
  }

  /** The learned (word, vector) table — the artifact a persisted
    * deployment ships instead of retraining (a parquet-shipped public
    * word-vector table drops in through the same constructor).
    */
  def wordVectors: DataFrame = model.getVectors
}

object Word2VecEmbedder {

  /** Train on a (doc_id, text) relation. Tokenization is the same
    * whitespace split every text operator here uses — corpus and query
    * paths MUST tokenize identically for retrieval to compose.
    */
  def train(corpus: DataFrame, dim: Int = 32, minCount: Int = 1,
            windowSize: Int = 5, maxIter: Int = 1,
            seed: Long = 42L): Word2VecEmbedder = {
    val w2v = new org.apache.spark.ml.feature.Word2Vec()
      .setVectorSize(dim).setMinCount(minCount).setWindowSize(windowSize)
      .setMaxIter(maxIter).setSeed(seed)
      .setNumPartitions(1) // determinism (see class doc)
      .setInputCol("__words").setOutputCol("__vec")
    val sents = corpus
      .select(col("doc_id"), split(col("text"), " ").as("__words"))
      // one ordered partition: sentence order is part of the training
      // trajectory, and a shuffled read would fork the fitted weights
      .repartition(1).sortWithinPartitions("doc_id")
    new Word2VecEmbedder(w2v.fit(sents))
  }

  /** Wrap an already-fitted model (e.g. loaded from disk). */
  def apply(model: org.apache.spark.ml.feature.Word2VecModel): Word2VecEmbedder =
    new Word2VecEmbedder(model)
}
