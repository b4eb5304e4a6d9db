package graft.api

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED TOKENIZER ARTIFACT — the train-once/encode-forever hand-off
  * a training-data pipeline actually ships: both subword families
  * ([[TextAnalysis.bpeTrainOf]] BPE merges,
  * [[TextAnalysis.unigramTrainOf]] unigram-LM pieces) behind one
  * interface with `save`/`Tokenizer.load` round trip, so the tokenizer
  * fitted on the reference corpus encodes every later corpus snapshot
  * without retraining (and two pipelines sharing the artifact tokenize
  * IDENTICALLY — the reproducibility property token-count budgeting
  * depends on).
  *
  * Model state is merges/pieces — a few hundred rows, the centroid size
  * class; it persists as one tiny parquet with a `kind` discriminator
  * column. Encoding runs over the distinct-word vocabulary of the
  * TARGET corpus (never the token stream) — the scale shape of the
  * underlying operators.
  */
sealed trait Tokenizer {
  def kind: String

  /** Per-doc (doc_id, n_words, n_tokens, n_chars) under this model. */
  def encode(docs: DataFrame): DataFrame

  def save(spark: SparkSession, path: String): Unit
}

final class BpeTokenizer private[api] (val merges: Seq[(String, String)])
    extends Tokenizer {
  override val kind = "bpe"
  override def encode(docs: DataFrame): DataFrame =
    TextAnalysis.bpeEncodeOf(docs, merges)
  override def save(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    // step-0 header row: a BPE model legitimately trained to ZERO
    // merges (tiny corpus, high minPairCount) is a valid char-level
    // tokenizer — without the header its artifact would be an empty
    // parquet that load() cannot even discriminate
    (Seq((kind, 0L, "", "", 0L, 0L)) ++ merges.zipWithIndex
      .map { case ((l, r), i) => (kind, i + 1L, l, r, 0L, 0L) })
      .toDF("kind", "step", "left", "right", "n", "max_len")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }
}

/** BYTE-LEVEL BPE (VERDICT r10 #8 — the GPT-2/tiktoken family actual
  * LLM pipelines run): GPT-2-regex pretokenization + UTF-8 byte
  * fallback, so there is NO out-of-vocabulary text by construction —
  * any input decomposes to the 256-byte alphabet before merges apply.
  * Merge symbols are uppercase hex pairs ([[graft.operators
  * .TextAnalysis.byteSymbols]]).
  */
final class ByteBpeTokenizer private[api] (val merges: Seq[(String, String)])
    extends Tokenizer {
  override val kind = "byte_bpe"
  override def encode(docs: DataFrame): DataFrame =
    TextAnalysis.byteBpeEncodeOf(docs, merges)
  override def save(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    // same step-0 header discipline as BpeTokenizer: a zero-merge model
    // is a valid byte-level tokenizer and must load as one
    (Seq((kind, 0L, "", "", 0L, 0L)) ++ merges.zipWithIndex
      .map { case ((l, r), i) => (kind, i + 1L, l, r, 0L, 0L) })
      .toDF("kind", "step", "left", "right", "n", "max_len")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }
}

final class UnigramTokenizer private[api] (val pieces: Seq[(String, Long)],
                                           val maxPieceLen: Int)
    extends Tokenizer {
  override val kind = "unigram"
  override def encode(docs: DataFrame): DataFrame =
    TextAnalysis.unigramEncodeOf(docs, pieces, maxPieceLen)
  override def save(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    // max_len rides as a constant column so load() restores the exact
    // Viterbi window the model was trained with
    pieces.zipWithIndex
      .map { case ((p, n), i) => (kind, i + 1L, p, "", n, maxPieceLen.toLong) }
      .toDF("kind", "step", "left", "right", "n", "max_len")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }
}

object Tokenizer {

  def trainBpe(docs: DataFrame, nMerges: Int = 10,
               minPairCount: Long = 2): BpeTokenizer =
    new BpeTokenizer(TextAnalysis.bpeTrainOf(docs, nMerges, minPairCount)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq)

  def trainByteBpe(docs: DataFrame, nMerges: Int = 10,
                   minPairCount: Long = 2): ByteBpeTokenizer =
    new ByteBpeTokenizer(TextAnalysis.byteBpeTrainOf(docs, nMerges, minPairCount)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq)

  def trainUnigram(docs: DataFrame, vocabSize: Int = 120,
                   maxPieceLen: Int = 4, nIter: Int = 3,
                   seedSize: Int = 400): UnigramTokenizer =
    new UnigramTokenizer(
      TextAnalysis.unigramTrainOf(docs, vocabSize, maxPieceLen, nIter, seedSize)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq,
      maxPieceLen)

  /** Open a persisted tokenizer; the `kind` column discriminates. */
  def load(spark: SparkSession, path: String): Tokenizer = {
    val all = spark.read.parquet(path).orderBy("step").collect()
    require(all.nonEmpty, s"empty tokenizer artifact at $path")
    val rows = all.filter(_.getLong(1) > 0) // drop the BPE step-0 header
    all.head.getString(0) match {
      case "bpe" =>
        new BpeTokenizer(rows.map(r => (r.getString(2), r.getString(3))).toSeq)
      case "byte_bpe" =>
        new ByteBpeTokenizer(rows.map(r => (r.getString(2), r.getString(3))).toSeq)
      case "unigram" =>
        new UnigramTokenizer(
          rows.map(r => (r.getString(2), r.getLong(4))).toSeq,
          rows.head.getLong(5).toInt)
      case k => throw new IllegalArgumentException(s"unknown tokenizer kind $k")
    }
  }
}
