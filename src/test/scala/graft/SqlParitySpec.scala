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
