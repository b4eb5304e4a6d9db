package graft

import graft.api.{BpeTokenizer, Tokenizer, UnigramTokenizer}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TokenizerSpec extends SparkSpecBase {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-tok-$name")
    d.toFile.deleteOnExit(); d.toString + "/artifact"
  }

  private def counts(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("bpe tokenizer: train/encode parity with the operator, save/load round trip") {
    val docs = Tables.documents(spark, sf)
    val tok = Tokenizer.trainBpe(docs, nMerges = 8)
    assert(tok.merges.nonEmpty)
    val direct = counts(TextAnalysis.bpeEncode(spark, sf, nMerges = 8))
    assert(counts(tok.encode(docs)) === direct)
    val path = tmp("bpe")
    tok.save(spark, path)
    val back = Tokenizer.load(spark, path)
    assert(back.kind === "bpe")
    assert(back.asInstanceOf[BpeTokenizer].merges === tok.merges)
    assert(counts(back.encode(docs)) === direct)
  }

  test("unigram tokenizer: train/encode parity, save/load round trip keeps the viterbi window") {
    val docs = Tables.documents(spark, sf)
    val tok = Tokenizer.trainUnigram(docs, vocabSize = 80, maxPieceLen = 3)
    val direct = counts(tok.encode(docs))
    val path = tmp("uni")
    tok.save(spark, path)
    val back = Tokenizer.load(spark, path)
    assert(back.kind === "unigram")
    val u = back.asInstanceOf[UnigramTokenizer]
    assert(u.maxPieceLen === 3)
    assert(u.pieces === tok.pieces)
    assert(counts(back.encode(docs)) === direct)
  }

  test("a persisted tokenizer encodes a corpus it never trained on (OOV chars -> whole-word tokens)") {
    import spark.implicits._
    val tok = Tokenizer.trainUnigram(Tables.documents(spark, sf))
    val foreign = Seq(
      (1L, "join scan batch"),     // in-vocabulary words
      (2L, "zzz 日本語 qqq"),       // unseen characters
      (3L, "")).toDF("doc_id", "text")
    val out = tok.encode(foreign).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // known words segment into <= chars tokens; some compression expected
    assert(out(1L)._2 <= "joinscanbatch".length)
    // unknown-char words fall back to one token per word, not a crash
    assert(out(2L)._1 === 3L && out(2L)._2 >= 1L && out(2L)._2 <= "zzz日本語qqq".length)
    // empty text drops out entirely (no words)
    assert(!out.contains(3L))
  }
}
