package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DISTRIBUTED global-rank utilities — the shared "range-partition +
  * local window + broadcast per-partition offsets" pattern behind every
  * total-order operator here (ABC cumulative shares, CCNet terciles).
  * A naive global `Window.orderBy(...)` plans a SINGLE-TASK sort over
  * the whole relation (the scale-killer WindowExec itself warns about);
  * this shape keeps every task at |rows|/P and moves only P (or
  * P×|groups|) offset rows through the driver — bounded model state,
  * like k-means centroids.
  *
  * Determinism contract: partition ids are PINNED by localCheckpointing
  * the range-partitioned relation once — RangePartitioner re-samples
  * its bounds per execution, and the offsets job and the consumer job
  * must see the SAME pid assignment or ranks silently shear.
  *
  * Extracted (VERDICT r4 #10) from the hand-rolled twins in
  * `Relational.partsAbcAnalysis` and `TextAnalysis.ccnetBuckets`, with
  * an EquivalenceSpec case against the single-task window formulation
  * so the next global-rank operator can neither regress to a one-task
  * sort nor drift from exact window semantics.
  */
object DistributedRank {

  /** Range-partition by `sortCols`, pin partition ids, materialize. The
    * `pid` helper column rides along for the caller to drop/aggregate
    * away.
    */
  private def pinnedByRange(df: DataFrame, sortCols: Seq[Column]): DataFrame = {
    val nPart = df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartitionByRange(nPart, sortCols: _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
  }

  /** Global 1-based row number `out` (LONG) in `order` within each
    * `group` (empty = one global order), plus each group's total row
    * count as `totalOut` — SQL `row_number() OVER (PARTITION BY group
    * ORDER BY order)` + `count(*) OVER (PARTITION BY group)` semantics,
    * computed without any unpartitioned window. The per-(pid, group)
    * counts collect to the driver (P×|groups| longs) for an exclusive
    * prefix scan; `order` must be a total order within each group for
    * ranks to be deterministic.
    */
  def rowNumber(df: DataFrame, group: Seq[String], order: Seq[Column],
                out: String, totalOut: String): DataFrame = {
    val spark = df.sparkSession
    val parted = pinnedByRange(df, group.map(col(_).asc) ++ order)
    val counts = parted.groupBy(("pid" +: group).map(col): _*)
      .agg(count(lit(1)).as("c"))
      .orderBy((group :+ "pid").map(col): _*).collect()
    // exclusive prefix count of earlier pids within each group + totals
    val offsets = scala.collection.mutable.ArrayBuffer.empty[(Int, Seq[Any], Long)]
    val totals = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Long]
    counts.foreach { r =>
      val pid = r.getInt(0)
      val key = group.indices.map(i => r.get(i + 1))
      offsets += ((pid, key, totals.getOrElse(key, 0L)))
      totals(key) = totals.getOrElse(key, 0L) + r.getLong(group.size + 1)
    }
    val offSchema = StructType(
      StructField("__opid", IntegerType, nullable = false) +:
        group.zipWithIndex.map { case (g, i) =>
          parted.schema(g).copy(name = s"__og$i") } :+
        StructField(s"__${out}_off", LongType, nullable = false) :+
        StructField(totalOut, LongType, nullable = false))
    val offRows = offsets.toSeq.map { case (pid, key, off) =>
      Row.fromSeq(pid +: key :+ off :+ totals(key))
    }
    val offs = broadcast(spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), offSchema))
    // NULL-SAFE group-key match: SQL window semantics rank the NULL
    // group like any other, and a USING-join would silently DROP every
    // null-keyed row instead (<=> keeps them)
    val cond = (col("pid") === col("__opid")) +: group.zipWithIndex.map {
      case (g, i) => col(g) <=> col(s"__og$i") }
    val localW = Window.partitionBy(("pid" +: group).map(col): _*).orderBy(order: _*)
    parted.join(offs, cond.reduce(_ && _))
      .withColumn(out, row_number().over(localW) + col(s"__${out}_off"))
      .drop(s"__${out}_off" +: "__opid" +: group.indices.map(i => s"__og$i"): _*)
  }

  /** Exact global INCLUSIVE running DECIMAL sum of `value` in `order`
    * as column `out`, plus the exact grand total — `sum(value) OVER
    * (ORDER BY order)` semantics without the single-task sort. The
    * per-partition sums collect to the driver (P decimals) for an
    * exclusive prefix scan in java.math.BigDecimal (exact); `value`
    * must already be a DECIMAL column (engine-exact partial aggs).
    */
  def prefixSumDecimal(df: DataFrame, value: String, order: Seq[Column],
                       out: String): (DataFrame, BigDecimal) = {
    // the offset column must carry the INPUT's decimal scale — a fixed
    // scale-4 cast would silently round a higher-scale value column's
    // offsets at every partition boundary, breaking the exactness
    // contract
    val inScale = df.schema(value).dataType match {
      case dt: DecimalType => dt.scale
      case t => throw new IllegalArgumentException(
        s"prefixSumDecimal needs a DECIMAL value column, got $t for '$value'")
    }
    val parted = pinnedByRange(df, order)
    val psums = parted.groupBy("pid").agg(sum(value).as("psum"))
      .orderBy("pid").collect()
    var acc = java.math.BigDecimal.ZERO
    val offsets = psums.toSeq.map { r =>
      val off = acc; acc = acc.add(r.getDecimal(1)); (r.getInt(0), BigDecimal(off))
    }
    val total = BigDecimal(acc)
    val spark = df.sparkSession
    import spark.implicits._
    val offs = broadcast(offsets.toDF("pid", "__off")
      .select(col("pid"), col("__off").cast(s"decimal(38,$inScale)").as("__off")))
    val localW = Window.partitionBy("pid").orderBy(order: _*)
    val res = parted.join(offs, "pid")
      .withColumn(out, sum(value).over(localW) + col("__off"))
      .drop("__off")
    (res, total)
  }
}
