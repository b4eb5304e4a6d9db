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

  test("scalar functions ride the same extensions wiring") {
    val j = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
      .head().getDouble(0)
    assert(math.abs(j - 1.0) < 1e-12)
  }
}
