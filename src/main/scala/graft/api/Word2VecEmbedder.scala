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

  /** Persist the fitted model as a plain (word, vec ARRAY<FLOAT>)
    * parquet table — the Tokenizer train-once/serve-forever
    * discipline on the embedding axis. Floats are the model's own
    * internal precision, so [[Word2VecEmbedder.load]] round-trips
    * BIT-EXACTLY (getVectors' doubles are float-widened). Refuses to
    * overwrite (model artifacts are immutable; retrain into a fresh
    * path and re-point).
    */
  def save(path: String): Unit = {
    import org.apache.spark.ml.functions.vector_to_array
    wordVectors
      .select(col("word"), vector_to_array(col("vector"), "float32").as("vec"))
      .write.parquet(path)
  }
}

object Word2VecEmbedder {

  /** The serving-artifact trainer defaults, named once so [[train]]
    * and [[trainerId]] cannot drift apart.
    */
  val DefaultDim = 32
  val DefaultMinCount = 1
  val DefaultWindow = 5
  val DefaultIter = 1
  val DefaultSeed = 42L

  /** The trainer's identity string — a format version plus every
    * default that shapes the fitted weights. It PREFIXES the artifact
    * corpus fingerprint, so changing the trainer (a new dim, another
    * seed, a v2 format) INVALIDATES persisted artifacts instead of
    * silently serving stale-format vectors whose corpus half still
    * matches (ADVICE r8).
    */
  val trainerId: String =
    s"w2v-v1:dim=$DefaultDim:minCount=$DefaultMinCount:" +
      s"window=$DefaultWindow:iter=$DefaultIter:seed=$DefaultSeed:np=1"

  /** Train on a (doc_id, text) relation. Tokenization is the same
    * whitespace split every text operator here uses — corpus and query
    * paths MUST tokenize identically for retrieval to compose.
    */
  def train(corpus: DataFrame, dim: Int = DefaultDim, minCount: Int = DefaultMinCount,
            windowSize: Int = DefaultWindow, maxIter: Int = DefaultIter,
            seed: Long = DefaultSeed): Word2VecEmbedder = {
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

  /** Reopen a [[Word2VecEmbedder!.save saved]] model — `w2v_warm`
    * becomes a pure read: no fit, no corpus scan.
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Word2VecEmbedder =
    fromTable(spark.read.parquet(path))

  /** Build an embedder from ANY (word, vec ARRAY<FLOAT/DOUBLE>) table —
    * the shipped-public-word-vector path (a GloVe/fastText parquet
    * drops in here; QdrantCloud.py:20-22's pretrained-encoder role in
    * batch form). The table is MODEL state (vocab × dim floats — the
    * centroid size class, same bound MLlib's own transform broadcasts),
    * collected once and reassembled into the real MLlib model via
    * [[org.apache.spark.ml.graft.W2VBridge]] so table-loaded and
    * freshly-trained embedders serve through IDENTICAL transform code.
    */
  def fromTable(table: DataFrame): Word2VecEmbedder = {
    val rows = table
      .select(col("word").cast("string"), col("vec").cast("array<float>"))
      .collect() // vocab × dim model state — bounded by the vocabulary
    require(rows.nonEmpty, "word-vector table is empty")
    val vecs = rows.map(r => r.getString(0) -> r.getSeq[Float](1).toArray).toMap
    val dims = vecs.valuesIterator.map(_.length).toSet
    require(dims.size == 1, s"inconsistent vector dims in table: $dims")
    new Word2VecEmbedder(
      org.apache.spark.ml.graft.W2VBridge.model(vecs, dims.head))
  }
}
