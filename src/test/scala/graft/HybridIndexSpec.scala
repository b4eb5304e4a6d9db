package graft

import graft.api.HybridIndex
import graft.operators.{TextAnalysis, VectorStore}
import org.apache.spark.sql.functions._

class HybridIndexSpec extends SparkSpecBase {

  private lazy val dir = java.nio.file.Files
    .createTempDirectory("hybrid_idx").toString

  private lazy val index: HybridIndex = {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    // vector side mirrors vs_hybrid_search's corpus: every embedding
    // except the query vector (doc 0)
    val vecs = Tables.embeddings(spark, sf)
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id").as("doc_id"),
        graft.functions.Vectors.toDouble(col("embedding")).as("vec"))
    HybridIndex.build(spark, docs, vecs, dir)
  }

  private lazy val qvec: Seq[Double] = Tables.embeddings(spark, sf)
    .filter(col("vec_id") === 0)
    .select(graft.functions.Vectors.toDouble(col("embedding")))
    .head().getSeq[Double](0)

  test("keywordSearch is bit-for-bit BM25 parity with the operator") {
    val expected = TextAnalysis.bm25Search(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = index.keywordSearch(Seq("join", "hash", "scan", "merge")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expected)
  }

  test("cache opt-out (the 100-TB open) serves every tier identically") {
    index // force the build
    val uncached = HybridIndex.open(spark, dir, cache = false)
    try {
      val terms = Seq("join", "hash", "scan", "merge")
      assert(uncached.keywordSearch(terms).collect().toSeq ===
        index.keywordSearch(terms).collect().toSeq)
      assert(uncached.search(terms, qvec).collect().toSeq ===
        index.search(terms, qvec).collect().toSeq)
      assert(uncached.sparseSearch(Map("join" -> 1.0)).collect().toSeq ===
        index.sparseSearch(Map("join" -> 1.0)).collect().toSeq)
    } finally uncached.close()
  }

  test("fused search matches vs_hybrid_search rank for rank") {
    val expected = VectorStore.hybridSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    val got = index.search(Seq("join", "hash", "scan", "merge"), qvec).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    assert(got.toSeq === expected.toSeq)
  }

  test("save/open round trip serves identically") {
    index // force build
    val reopened = HybridIndex.open(spark, dir)
    val a = index.search(Seq("join", "hash"), qvec).collect().map(_.toSeq)
    val b = reopened.search(Seq("join", "hash"), qvec).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("allow-set filtering gates candidates before the cut, never after") {
    import spark.implicits._
    val terms = Seq("join", "hash", "scan", "merge")
    // an allow set that the unfiltered top-k mostly misses: even doc_ids
    val allow = Tables.documents(spark, sf)
      .select("doc_id").filter(col("doc_id") % 2 === 0)
    val allowSet = allow.collect().map(_.getLong(0)).toSet

    // per-doc scores are independent of other candidates, so filtering
    // candidates commutes with scoring: filtered top-k == (unfiltered
    // FULL-depth ranking) restricted to the allow set, cut to k
    val fullKw = index.keywordSearch(terms, k = 1000000).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val expectKw = fullKw.filter(t => allowSet(t._1)).take(5).toSeq
    val gotKw = index.keywordSearch(terms, k = 5, allow = Some(allow))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(gotKw === expectKw)
    assert(gotKw.nonEmpty && gotKw.forall(t => allowSet(t._1)))

    val fullVec = index.vectorSearch(qvec, k = 1000000).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val expectVec = fullVec.filter(t => allowSet(t._1)).take(5).toSeq
    val gotVec = index.vectorSearch(qvec, k = 5, allow = Some(allow))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(gotVec === expectVec)

    // fused: every hit obeys the filter, ranks are dense from 1, and an
    // all-covering allow set is a no-op (identity)
    val fused = index.search(terms, qvec, k = 5, allow = Some(allow)).collect()
    assert(fused.nonEmpty && fused.forall(r => allowSet(r.getLong(1))))
    assert(fused.map(_.getLong(0)).toSeq === (1L to fused.length))
    val everything = Tables.documents(spark, sf).select("doc_id")
    val viaAll = index.search(terms, qvec, k = 5, allow = Some(everything))
      .collect().map(_.toSeq)
    val unfiltered = index.search(terms, qvec, k = 5).collect().map(_.toSeq)
    assert(viaAll.toSeq === unfiltered.toSeq)
  }

  test("filter object reaches every search tier via the payload allow-set") {
    import graft.api.Filters._
    val terms = Seq("join", "hash", "scan", "merge")
    // payload lives beside the hybrid artifact — the documents relation
    // with a derived tenant field
    val payload = Tables.documents(spark, sf)
      .select(col("doc_id"), (col("doc_id") % 2).as("parity"), col("lang"))
    val f = PFilter(must = Seq(RangeInt("parity", 0, 0)),
      mustNot = Seq(MatchValue("lang", "de")))
    val allow = payload.filter(
      coalesce(col("parity").between(0, 0), lit(false)) &&
        !coalesce(col("lang") === "de", lit(false))).select("doc_id")
    // each tier: the filter-object form ≡ the hand-built allow-set form
    assert(index.keywordSearchFiltered(terms, payload, f, k = 5)
      .collect().map(_.toSeq).toSeq ===
      index.keywordSearch(terms, k = 5, allow = Some(allow))
        .collect().map(_.toSeq).toSeq)
    assert(index.searchFiltered(terms, qvec, payload, f, k = 5)
      .collect().map(_.toSeq).toSeq ===
      index.search(terms, qvec, k = 5, allow = Some(allow))
        .collect().map(_.toSeq).toSeq)
    assert(index.sparseSearchFiltered(Map("join" -> 1.0), payload, f, k = 5)
      .collect().map(_.toSeq).toSeq ===
      index.sparseSearch(Map("join" -> 1.0), k = 5, allow = Some(allow))
        .collect().map(_.toSeq).toSeq)
    assert(index.keywordSearchFiltered(terms, payload, f, k = 5)
      .collect().nonEmpty)
    // validation is loud: unknown field, missing doc_id column
    intercept[IllegalArgumentException](
      index.allowSet(payload, PFilter(must = Seq(MatchValue("nope", "x")))))
    intercept[IllegalArgumentException](
      index.allowSet(payload.drop("doc_id"),
        PFilter(must = Seq(MatchValue("lang", "en")))))
  }

  test("sparseSearchByDoc is bit-for-bit parity with the vs_sparse_search operator") {
    val expected = VectorStore.sparseSearch(spark, sf, queryDoc = 0).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = index.sparseSearchByDoc(0).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("sparse modifier: idf — artifact ≡ operator bit-for-bit, raw weights stay stored") {
    // the stored-weights convention modifier: idf re-weights
    // server-side: query vector = doc 0's RAW term frequencies
    val q = Tables.documents(spark, sf).filter(col("doc_id") === 0)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("tf"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val expected = VectorStore.sparseSearchIdf(spark, sf, queryDoc = 0).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // the operator excludes the query doc; the artifact expresses that
    // as the allow-set gate (same filtered-search discipline)
    val allow = Tables.documents(spark, sf)
      .select("doc_id").filter(col("doc_id") =!= 0)
    val got = index.sparseSearch(q, k = 10, allow = Some(allow),
        modifier = "idf").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expected && got.nonEmpty)
    // the modifier changes the RANKING MATH, not the stored weights:
    // the same call without it serves the tf·idf-weighted convention
    val plain = index.sparseSearch(q, k = 10, allow = Some(allow)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(plain != got,
      "idf modifier must produce different scores than the plain route")
    // unknown modifiers refuse loudly
    intercept[IllegalArgumentException](
      index.sparseSearch(q, 5, modifier = "tfidf"))
  }

  test("sparseSearch accepts an explicit query vector and honors the allow set") {
    val q = Map("join" -> 2.0, "hash" -> 1.0, "scan" -> 0.5)
    val hits = index.sparseSearch(q, k = 8).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(hits.nonEmpty)
    assert(hits.map(_._2).toSeq === hits.map(_._2).sortBy(-_).toSeq) // desc scores
    // allow gates candidates before the cut: restrict-then-cut equals
    // full-depth-cut-then-restrict (per-doc scores candidate-independent)
    val allow = Tables.documents(spark, sf)
      .select("doc_id").filter(col("doc_id") % 2 === 0)
    val allowSet = allow.collect().map(_.getLong(0)).toSet
    val full = index.sparseSearch(q, k = 1000000).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val expect = full.filter(t => allowSet(t._1)).take(4).toSeq
    val gotAllow = index.sparseSearch(q, k = 4, allow = Some(allow)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(gotAllow === expect)
  }

  test("keywordSearch survives duplicate and dotted query terms") {
    // duplicate terms dedupe on entry (no ambiguous-alias analysis
    // error) and score identically to the distinct list; terms holding
    // '.' or '`' (realistic whitespace tokens like "v1.2") must not
    // parse as nested-field references — positional tf_i/df_i aliases
    // make both safe
    val dup = index.keywordSearch(Seq("join", "join", "hash")).collect().map(_.toSeq)
    val distinct = index.keywordSearch(Seq("join", "hash")).collect().map(_.toSeq)
    assert(dup.toSeq === distinct.toSeq)
    assert(index.keywordSearch(Seq("v1.2", "e.g.", "`tick`")).collect().isEmpty)
    val bm = operators.TextAnalysis.bm25Search(spark, sf,
      terms = Seq("join", "join", "v1.2")).collect()
    val bmDistinct = operators.TextAnalysis.bm25Search(spark, sf,
      terms = Seq("join", "v1.2")).collect()
    assert(bm.map(_.toSeq).toSeq === bmDistinct.map(_.toSeq).toSeq)
  }

  test("query terms push into the postings scan (only their lists are read)") {
    val p = index.keywordSearch(Seq("join", "hash")).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PushedFilters") && p.contains("In(token"),
      s"term predicate not pushed to the postings scan:\n$p")
  }

  private lazy val allDocs = Tables.documents(spark, sf).select("doc_id", "text")
  private lazy val allVecs = Tables.embeddings(spark, sf)
    .filter(col("vec_id") =!= 0)
    .select(col("vec_id").as("doc_id"),
      graft.functions.Vectors.toDouble(col("embedding")).as("vec"))
  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"hybrid_$tag").toString
  private val terms = Seq("join", "hash", "scan", "merge")

  test("insertTo snapshot serves exactly like a from-scratch rebuild on the merged corpus") {
    val base = HybridIndex.build(spark,
      allDocs.filter(col("doc_id") % 2 === 0),
      allVecs.filter(col("doc_id") % 2 === 0), tmp("base"))
    val inc = base.insertTo(
      allDocs.filter(col("doc_id") % 2 =!= 0),
      allVecs.filter(col("doc_id") % 2 =!= 0), tmp("inc"))
    // `index` is the from-scratch build over the full corpus
    assert(inc.keywordSearch(terms).collect().map(_.toSeq).toSeq ===
      index.keywordSearch(terms).collect().map(_.toSeq).toSeq)
    assert(inc.search(terms, qvec).collect().map(_.toSeq).toSeq ===
      index.search(terms, qvec).collect().map(_.toSeq).toSeq)
  }

  test("insertTo upserts: a re-ingested doc's new text wins, matching a patched rebuild") {
    val target = allDocs.select("doc_id").orderBy("doc_id").head().getLong(0)
    val newText = "join join join join join join join join"
    val patch = allDocs.filter(col("doc_id") === target)
      .withColumn("text", lit(newText))
    val patchVec = allVecs.filter(col("doc_id") === target)
    val inc = index.insertTo(patch, patchVec, tmp("upsert"))
    val rebuilt = HybridIndex.build(spark,
      allDocs.withColumn("text",
        when(col("doc_id") === target, lit(newText)).otherwise(col("text"))),
      allVecs, tmp("patched"))
    assert(inc.keywordSearch(terms).collect().map(_.toSeq).toSeq ===
      rebuilt.keywordSearch(terms).collect().map(_.toSeq).toSeq)
    // the stuffed doc now dominates its term
    assert(inc.keywordSearch(Seq("join"), k = 1).head().getLong(0) === target)
  }

  test("deleteTo removes the slice, matching a rebuild on the filtered corpus") {
    val del = index.deleteTo(col("doc_id") < 100, tmp("del"))
    val rebuilt = HybridIndex.build(spark,
      allDocs.filter(col("doc_id") >= 100),
      allVecs.filter(col("doc_id") >= 100), tmp("delref"))
    val got = del.keywordSearch(terms).collect()
    assert(got.forall(_.getLong(0) >= 100), "deleted doc resurfaced")
    assert(got.map(_.toSeq).toSeq ===
      rebuilt.keywordSearch(terms).collect().map(_.toSeq).toSeq)
  }

  test("maintenance refuses to overwrite the open snapshot (even via an aliased path)") {
    index // force build at `dir`
    intercept[IllegalArgumentException] {
      index.insertTo(allDocs.limit(1), allVecs.limit(1), dir)
    }
    intercept[IllegalArgumentException] {
      index.deleteTo(col("doc_id") === 1, dir + "/")
    }
  }
}
