package graft

/** The `graft_query` TABLE FUNCTION: the whole inventory callable from
  * plain SQL — a SQL-only client (BI tool, notebook, spark-sql shell)
  * runs every reference-parity query with zero Scala.
  */
class GraftQuerySpec extends SparkSpecBase {

  test("graft_query resolves a named query to its operator plan, results identical") {
    val viaSql = spark.sql(
      s"SELECT * FROM graft_query('q1_pricing_summary', '$sf')").collect().toSeq
    val direct = SparkEntry.queries("q1_pricing_summary")(spark, sf).collect().toSeq
    assert(viaSql === direct)
  }

  test("graft_query composes with ordinary SQL around it") {
    val n = spark.sql(
      s"""SELECT count(*) AS n FROM graft_query('topk_per_group', '$sf')
         |WHERE rk <= 2""".stripMargin).head().getLong(0)
    val direct = SparkEntry.queries("topk_per_group")(spark, sf)
      .filter(org.apache.spark.sql.functions.col("rk") <= 2).count()
    assert(n === direct)
  }

  test("unknown query names are refused with the valid-name hint") {
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM graft_query('no_such_query', '$sf')").collect())
    assert(e.getMessage.contains("unknown graft query") ||
      Option(e.getCause).exists(_.getMessage.contains("unknown graft query")))
  }

  test("strictJoins gate: accidental products rejected, deliberate shapes stay legal") {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    import spark.implicits._
    val a = Seq(1L, 2L).toDF("x")
    val b = Seq(3L, 4L).toDF("y")
    spark.conf.set("spark.graft.strictJoins", "true")
    try {
      // the accident: condition-less inner join, no hint
      val e = intercept[org.apache.spark.sql.AnalysisException](a.join(b).collect())
      assert(e.getMessage.contains("strictJoins"))
      // deliberate: explicit crossJoin says "I meant it"
      assert(a.crossJoin(b).count() === 4L)
      // deliberate: the hinted broadcast-nested-loop idiom (batched search)
      assert(a.join(broadcast(b)).count() === 4L)
      // ordinary conditioned joins untouched
      assert(a.join(b, col("x") + 2 === col("y")).count() === 2L)
      // and the gate catches the accident inside a whole operator plan too
      val e2 = intercept[org.apache.spark.sql.AnalysisException](
        a.join(b).filter(lit(true)).groupBy("x").count().collect())
      assert(e2.getMessage.contains("strictJoins"))
      // a broadcast hint DEEP inside one arm must not bless an
      // unrelated outer product (hint scope stops at nested joins)
      val c = Seq(9L).toDF("z")
      val e3 = intercept[org.apache.spark.sql.AnalysisException](
        a.join(broadcast(b), col("x") + 2 === col("y")).join(c).collect())
      assert(e3.getMessage.contains("strictJoins"))
      // a non-broadcast strategy hint does NOT bless: MERGE/SHUFFLE_HASH
      // need equi-keys, so the condition-less join still plans a product
      val e4 = intercept[org.apache.spark.sql.AnalysisException](
        a.join(b.hint("merge")).collect())
      assert(e4.getMessage.contains("strictJoins"))
      val e5 = intercept[org.apache.spark.sql.AnalysisException](
        a.join(b.hint("shuffle_hash")).collect())
      assert(e5.getMessage.contains("strictJoins"))
    } finally spark.conf.unset("spark.graft.strictJoins")
    // gate off: the permissive default is unchanged
    assert(a.join(b).count() === 4L)
  }

  test("parameterized graft_query equals the direct Scala call with the same args") {
    // map(...) literal form
    val viaSql = spark.sql(
      s"SELECT * FROM graft_query('ann_brute_topk', '$sf', map('k', '5'))")
      .collect().toSeq
    val direct = operators.Ann.bruteTopK(spark, sf, k = 5).collect().toSeq
    assert(viaSql === direct)
    assert(viaSql.size < operators.Ann.bruteTopK(spark, sf).collect().length,
      "k=5 must actually narrow the default-k result")
    // compact 'k=v' string form, double-typed knob
    val viaStr = spark.sql(
      s"SELECT * FROM graft_query('dedup_ngram_jaccard', '$sf', 't=0.9')")
      .collect().toSeq
    assert(viaStr === operators.Dedup.ngramJaccard(spark, sf, t = 0.9).collect().toSeq)
    // multi-knob
    val multi = spark.sql(
      s"""SELECT * FROM graft_query('vs_search_match_text', '$sf',
         |map('k', '3', 'terms', 'the data'))""".stripMargin).collect().toSeq
    assert(multi === operators.VectorStore
      .searchMatchText(spark, sf, 3, Seq("the", "data")).collect().toSeq)
    // the text-index route takes the same knobs and returns the same
    // rows from SQL (two physical routes, one answer)
    val indexed = spark.sql(
      s"""SELECT * FROM graft_query('vs_search_match_text_indexed', '$sf',
         |map('k', '3', 'terms', 'the data'))""".stripMargin).collect().toSeq
    assert(indexed === multi)
  }

  test("the filter boolean algebra is reachable from SQL as a JSON filter object") {
    import graft.api.Filters._
    // the Qdrant wire form rides the map(...) literal (the compact
    // 'k=v' form splits on commas, which JSON carries)
    val json =
      """{"must": [{"key": "user_id", "range": {"gte": 2, "lte": 9}}],
        | "should": [{"key": "lang", "match": {"value": "en"}},
        |            {"key": "site", "match": {"value": "src3"}}]}""".stripMargin
    val viaSql = spark.sql(
      s"""SELECT * FROM graft_query('vs_search_filter_should', '$sf',
         |map('filter', '${json.replace("'", "''").replace("\n", " ")}'))"""
        .stripMargin).collect().toSeq
    val direct = operators.VectorStore.searchFilterWith(spark, sf,
      PFilter(must = Seq(IntBounds("user_id", gte = Some(2L), lte = Some(9L))),
        should = Seq(MatchValue("lang", "en"), MatchValue("site", "src3"))))
      .collect().toSeq
    assert(viaSql === direct && viaSql.nonEmpty)
    // the SAME SQL tree equals the canonical oracle-gated entry — the
    // JSON route and the hand-built route are one plan
    assert(viaSql === operators.VectorStore.searchFilterShould(spark, sf)
      .collect().toSeq)
    // must_not + min_should from SQL too
    val json2 =
      """{"must_not": [{"key": "lang", "match": {"value": "de"}}],
        | "min_should": {"conditions": [
        |   {"key": "lang", "match": {"value": "en"}},
        |   {"key": "user_id", "range": {"gte": 0, "lte": 5}}],
        |   "min_count": 1}}""".stripMargin
    val viaSql2 = spark.sql(
      s"""SELECT * FROM graft_query('vs_search_filter_should', '$sf',
         |map('filter', '${json2.replace("'", "''").replace("\n", " ")}'))"""
        .stripMargin).collect().toSeq
    val direct2 = operators.VectorStore.searchFilterWith(spark, sf,
      PFilter(mustNot = Seq(MatchValue("lang", "de")),
        minShould = Some((Seq(MatchValue("lang", "en"),
          IntBounds("user_id", gte = Some(0L), lte = Some(5L))), 1))))
      .collect().toSeq
    assert(viaSql2 === direct2 && viaSql2.nonEmpty)
    // malformed JSON refuses loudly
    val e = intercept[Exception](spark.sql(
      s"""SELECT * FROM graft_query('vs_search_filter_should', '$sf',
         |map('filter', '{"frobnicate": []}'))""".stripMargin).collect())
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(_.getMessage.contains("unknown filter clause")))
  }

  test("parameter validation fails loudly: unknown keys, bad values, unparameterized ops") {
    def err(sql: String): String = {
      val e = intercept[Exception](spark.sql(sql).collect())
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
    }
    assert(err(s"SELECT * FROM graft_query('ann_brute_topk', '$sf', map('kk', '5'))")
      .contains("unknown parameter"))
    assert(err(s"SELECT * FROM graft_query('ann_brute_topk', '$sf', 'k=five')")
      .contains("not valid"))
    assert(err(s"SELECT * FROM graft_query('q1_pricing_summary', '$sf', map('k', '5'))")
      .contains("takes no parameters"))
  }

  test("scalar functions ride the same extensions wiring") {
    val j = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .head().getDouble(0)
    assert(math.abs(j - 1.0) < 1e-12)
  }
}
