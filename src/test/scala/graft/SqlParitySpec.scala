package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** The engine's results are front-end-independent: the same logical
  * query through `spark.sql` over registered views must match the
  * DataFrame-API operator byte-for-byte (both compile to the same
  * Catalyst plans).
  */
class SqlParitySpec extends SparkSpecBase {

  private def view(name: String): Unit =
    Tables.t(spark, sf, name).createOrReplaceTempView(name)

  test("spark.sql q1 matches the DataFrame operator") {
    view("lineitem")
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin).collect()
    val df = Relational.q1PricingSummary(spark, sf).collect()
    assert(sql.map(_.toString).toSeq === df.map(_.toString).toSeq)
  }

  test("spark.sql anti join matches customers_without_orders") {
    view("customer"); view("orders")
    val sql = spark.sql(
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin).collect()
    val df = Relational.customersWithoutOrders(spark, sf).collect()
    assert(sql.map(_.toString).toSeq === df.map(_.toString).toSeq)
  }

  test("spark.sql q21 matches the DataFrame operator") {
    view("lineitem"); view("orders"); view("supplier")
    val sql = spark.sql(
      """WITH ps AS (SELECT l_orderkey, l_suppkey, max(l_shipdate) AS last_ship
        |  FROM lineitem GROUP BY 1, 2),
        |po AS (SELECT l_orderkey, count(*) AS n_supp,
        |    sum(CASE WHEN last_ship > o_orderdate + INTERVAL 90 DAYS
        |      THEN 1L ELSE 0L END) AS n_late,
        |    max(CASE WHEN last_ship > o_orderdate + INTERVAL 90 DAYS
        |      THEN l_suppkey END) AS late_supp
        |  FROM ps JOIN orders ON l_orderkey = o_orderkey GROUP BY 1)
        |SELECT s_name, count(*) AS numwait
        |FROM po JOIN supplier ON s_suppkey = late_supp
        |WHERE n_supp >= 2 AND n_late = 1
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin).collect()
    val df = Relational.q21WaitingSupplier(spark, sf).collect()
    assert(sql.map(_.toString).toSeq === df.map(_.toString).toSeq)
  }

  test("spark.sql window top-k matches topk_per_group") {
    view("orders")
    val sql = spark.sql(
      """SELECT o_orderpriority, rk, o_orderkey, o_totalprice AS price FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk FROM orders)
        |WHERE rk <= 5 ORDER BY o_orderpriority, rk""".stripMargin)
      .select(col("o_orderpriority"), col("rk").cast("long").as("rk"),
        col("o_orderkey"), col("price"))
      .collect()
    val df = Relational.topkPerGroup(spark, sf).collect()
    assert(sql.map(_.toString).toSeq === df.map(_.toString).toSeq)
  }
}
