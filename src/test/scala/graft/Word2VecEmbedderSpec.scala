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

  test("save/load round-trips bit-exactly and a loaded model serves identically") {
    val path = java.nio.file.Files.createTempDirectory("graft-w2v-").toString + "/model"
    embedder.save(path)
    val loaded = Word2VecEmbedder.load(spark, path)
    // weights: bit-exact (floats are the model's own precision)
    val a = embedder.wordVectors.orderBy("word").collect()
      .map(r => r.getString(0) -> r.getAs[org.apache.spark.ml.linalg.Vector](1).toArray.toSeq)
    val b = loaded.wordVectors.orderBy("word").collect()
      .map(r => r.getString(0) -> r.getAs[org.apache.spark.ml.linalg.Vector](1).toArray.toSeq)
    assert(a.toSeq === b.toSeq)
    // serving: the loaded model embeds IDENTICALLY (same MLlib
    // transform code via the bridge — includes the OOV-token and
    // divide-by-total-length semantics)
    val docs = (corpus :+ (3L, "car unknownword") :+ (4L, "")).toDF("doc_id", "text")
    val e1 = embedder.embed(docs).orderBy("doc_id").collect().map(_.toSeq)
    val e2 = loaded.embed(docs).orderBy("doc_id").collect().map(_.toSeq)
    assert(e1.toSeq === e2.toSeq)
    // artifacts are immutable: same-path save refuses
    intercept[Exception](loaded.save(path))
  }

  test("fromTable accepts any (word, vec) parquet — the shipped-vector path") {
    import spark.implicits._
    // a hand-built "pretrained" table with double vectors (the public-
    // download shape); fromTable must cast and serve through it
    val shipped = Seq(
      ("hot", Seq(1.0, 0.0)), ("cold", Seq(-1.0, 0.0)), ("warm", Seq(0.9, 0.1)))
      .toDF("word", "vec")
    val emb = Word2VecEmbedder.fromTable(shipped)
    val out = emb.embed(Seq((1L, "hot warm"), (2L, "cold")).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // mean of (1,0) and float32(0.9,0.1)
    assert(math.abs(out(1L)(0) - (1.0 + 0.9f) / 2) < 1e-7)
    assert(math.abs(out(2L)(0) - -1.0) < 1e-7)
    intercept[IllegalArgumentException](
      Word2VecEmbedder.fromTable(Seq.empty[(String, Seq[Double])].toDF("word", "vec")))
    intercept[IllegalArgumentException](Word2VecEmbedder.fromTable(
      Seq(("a", Seq(1.0)), ("b", Seq(1.0, 2.0))).toDF("word", "vec")))
  }

  test("vs_text_search_semantic serves identical results from a LOADED model") {
    val path = java.nio.file.Files.createTempDirectory("graft-w2v-sf-").toString + "/model"
    VectorStore.w2vEmbedder(spark, sf).save(path)
    val loaded = Word2VecEmbedder.load(spark, path)
    val viaTrained = VectorStore.textSearchSemantic(spark, sf).collect().toSeq
    val viaLoaded = VectorStore.textSearchSemanticWith(spark, sf, loaded).collect().toSeq
    assert(viaTrained === viaLoaded)
  }

  test("the corpus fingerprint separates duplicate-swapped corpora and trainer versions") {
    import graft.operators.VectorStore
    import spark.implicits._
    // XOR's algebraic hole (VERDICT r8): {x, x, z} and {y, y, z} have
    // equal counts and equal XOR (the even-duplicated doc cancels
    // pairwise in both) — the SUM term must separate them
    val a = Seq((1L, "dup"), (1L, "dup"), (3L, "other")).toDF("doc_id", "text")
    val b = Seq((2L, "swap"), (2L, "swap"), (3L, "other")).toDF("doc_id", "text")
    val (fa, fb) = (VectorStore.corpusFingerprint(a), VectorStore.corpusFingerprint(b))
    assert(fa !== fb, s"duplicate-swapped corpora must not collide: $fa")
    // order-independence holds (the property XOR was there for)
    val aShuffled = Seq((3L, "other"), (1L, "dup"), (1L, "dup")).toDF("doc_id", "text")
    assert(VectorStore.corpusFingerprint(aShuffled) === fa)
    // the trainer id prefixes the fingerprint: a trainer change refuses
    // every persisted artifact rather than serving stale-format vectors
    assert(fa.startsWith(Word2VecEmbedder.trainerId + ":"))
    // two DIFFERENT corpora sharing a basename resolve to distinct
    // artifact dirs (the fingerprint-hash suffix), while the SAME
    // corpus resolves to the same dir from ANY path — the artifact
    // name is content-keyed, never filesystem-keyed (ADVICE r9: a
    // canonical-path hash bound committed artifacts to one machine's
    // checkout location, silently retraining everywhere else)
    val d1 = java.nio.file.Files.createTempDirectory("w2vdir-a").resolve("sfX")
    val d2 = java.nio.file.Files.createTempDirectory("w2vdir-b").resolve("sfX")
    assert(VectorStore.w2vArtifactDir("r", d1.toString, fa).getName !==
      VectorStore.w2vArtifactDir("r", d2.toString, fb).getName)
    assert(VectorStore.w2vArtifactDir("r", d1.toString, fa) !==
      VectorStore.w2vArtifactDir("r", d1.toString, fb))
    assert(VectorStore.w2vArtifactDir("r", d1.toString, fa).getName ===
      VectorStore.w2vArtifactDir("r", d2.toString, fa).getName)
  }

  test("w2vEmbedder serves a fingerprint-fresh tracked artifact, retrains on drift") {
    import graft.operators.{SessionMemo, VectorStore}
    import spark.implicits._
    val tmpRoot = java.nio.file.Files.createTempDirectory("w2v-art-").toString
    val old = sys.props.get("graft.w2v.artifacts")
    sys.props("graft.w2v.artifacts") = tmpRoot
    try {
      val dir = VectorStore.w2vArtifactDir(spark, sf) // resolves under tmpRoot
      new java.io.File(dir, "vectors").mkdirs()
      // a deliberately TAMPERED one-word vocabulary with the CORRECT
      // corpus fingerprint: if the serving path loads (it must), the
      // embedder visibly reflects it — equality with a fresh train
      // could never distinguish load from retrain
      Seq(("sentinel", Array.fill(4)(1.0f))).toDF("word", "vec")
        .write.mode("overwrite")
        .parquet(new java.io.File(dir, "vectors").toString)
      java.nio.file.Files.write(new java.io.File(dir, "corpus.fp").toPath,
        VectorStore.w2vCorpusFingerprint(spark, sf).getBytes("UTF-8"))
      SessionMemo.invalidatePath(sf) // drop any memoized trained encoder
      val served = VectorStore.w2vEmbedder(spark, sf)
      assert(served.wordVectors.count() === 1L,
        "a fingerprint-fresh artifact must be SERVED, not retrained over")
      // drift: stale fingerprint → the artifact is refused and the
      // encoder retrains on the live corpus
      java.nio.file.Files.write(new java.io.File(dir, "corpus.fp").toPath,
        "0:0".getBytes("UTF-8"))
      SessionMemo.invalidatePath(sf)
      val retrained = VectorStore.w2vEmbedder(spark, sf)
      assert(retrained.wordVectors.count() > 1L,
        "a stale artifact must retrain, never serve drifted vectors")
    } finally {
      old match {
        case Some(v) => sys.props("graft.w2v.artifacts") = v
        case None => sys.props.remove("graft.w2v.artifacts")
      }
      // leave no tampered encoder memoized for later suites
      SessionMemo.invalidatePath(sf)
    }
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
