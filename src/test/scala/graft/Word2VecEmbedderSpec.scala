package graft

import graft.api.{VectorIndex, Word2VecEmbedder}
import graft.operators.VectorStore
import org.apache.spark.sql.functions._

/** The REAL-encoder proof for the Embedder seam (VERDICT r4 #2): a
  * LEARNED distributional model must retrieve by MEANING — a synonym
  * query finds its paraphrase document with zero shared surface tokens,
  * which the feature-hash default can never do (no shared token ⇒
  * cosine 0). The training corpus is controlled: "car" and "auto"
  * occur in identical contexts, so skip-gram places them together.
  */
class Word2VecEmbedderSpec extends SparkSpecBase {
  import spark.implicits._

  // contexts make the semantics: car/auto share every neighbor,
  // sailing words never co-occur with driving words
  private lazy val trainDocs = {
    val drive = Seq("car", "auto")
      .flatMap(w => Seq.fill(30)(s"the $w drives fast on the long road"))
    val sail = Seq.fill(30)("a boat sails slow across the wide sea")
    (drive ++ sail).zipWithIndex.map { case (t, i) => (1000L + i, t) }
  }

  private lazy val corpus = Seq(
    (1L, "auto drives road"), // paraphrase of the query, zero shared tokens
    (2L, "boat sails sea")    // unrelated
  )

  private lazy val embedder = Word2VecEmbedder.train(
    (trainDocs ++ corpus).toDF("doc_id", "text"), dim = 16, maxIter = 4)

  test("training is deterministic: same seed, same weights") {
    val again = Word2VecEmbedder.train(
      (trainDocs ++ corpus).toDF("doc_id", "text"), dim = 16, maxIter = 4)
    val a = embedder.wordVectors.orderBy("word").collect().map(_.toSeq)
    val b = again.wordVectors.orderBy("word").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("synonyms land together: cos(car, auto) far above cos(car, boat)") {
    val vecs = embedder.wordVectors.collect()
      .map(r => r.getString(0) -> r.getAs[org.apache.spark.ml.linalg.Vector](1).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val syn = cos(vecs("car"), vecs("auto"))
    val far = cos(vecs("car"), vecs("boat"))
    assert(syn > far + 0.2, s"cos(car,auto)=$syn not above cos(car,boat)=$far")
  }

  test("semantic retrieval through the VectorIndex seam: a zero-token-overlap paraphrase wins") {
    val idx = VectorIndex.fromTexts(
      corpus.toDF("doc_id", "text")
        .select(col("doc_id"), col("text"),
          lit(7L).as("user_id"), lit("s").as("site"), lit("en").as("lang")),
      embedder = embedder)
    // query shares NO token with doc 1 ("auto drives road") — only a
    // learned model can rank it first; feature hashing scores it 0.
    // searchText returns (rank, id, string, score): id is column 1
    val hits = idx.searchText("car", userId = 7L, k = 2).collect()
    assert(hits.nonEmpty)
    assert(hits.head.getLong(1) === 1L,
      s"paraphrase not ranked first: ${hits.map(_.toSeq).mkString(", ")}")
    // and the feature-hash default CANNOT make this distinction
    val fh = VectorStore.embedDocs(
      (Seq((10L, "car")) ++ corpus.map { case (i, t) => (i, t) }).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val overlap = fh(10L).zip(fh(1L)).map { case (a, b) => a * b }.sum
    assert(math.abs(overlap) < 1e-12,
      s"feature hash should score disjoint tokens 0, got $overlap")
  }

  test("vs_text_search_semantic runs on the test corpus: full pages, self at rank 1") {
    val rows = VectorStore.textSearchSemantic(spark, sf).collect()
    assert(rows.nonEmpty)
    // every query's rank-1 hit is itself (its own mean-vector is an
    // exact cosine-1 match; ties break to the lowest doc_id = self for
    // doc 0 and identical-text twins otherwise score identically)
    val r1 = rows.filter(_.getLong(1) === 1L)
    r1.foreach(r => assert(r.getDouble(3) >= 0.9999,
      s"rank-1 cosine ${r.getDouble(3)} for query ${r.getLong(0)}"))
  }
}
