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
}
