package graft.api

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** PERSISTED PAYLOAD-FIELD INDEX — the batch analogue of Qdrant's
  * `create_payload_index` (REQUIRED before efficient payload-filtered
  * search; the reference filters every /search call on site/lang,
  * /root/reference/search.py:31-49). Without it a 1%-selective `site`
  * filter still reads every row group of a 100 TB collection; with it
  * the filter becomes DIRECTORY PRUNING at the scan.
  *
  * The index is not a secondary postings structure but a LAYOUT — the
  * [[graft.sources.Sources.writeBucketed]] philosophy: pay one
  * re-organization at build time, and the storage layout IS the index
  * for every later query, with no join to reconcile. ONE copy of the
  * data serves every indexed field:
  *
  *  - **keyword** fields (low-cardinality tags — the advisor's
  *    ≤64-distinct criterion, [[graft.operators.VectorStore.payloadIndexPlan]])
  *    become Hive partition columns: `data/site=X/lang=Y/…`. Spark
  *    prunes on ANY partition column independently, not just a prefix,
  *    so each keyword field filters to its matching directories alone.
  *    The advisor's cardinality bound is what keeps the directory
  *    count (∏ distinct) sane — indexing a high-cardinality field as
  *    `keyword` is refused by no one but the operator who ignored the
  *    advisor's `text`/`skip` verdict.
  *  - **integer** fields become MIN/MAX-ZONED buckets: values are
  *    split at build-time percentile boundaries into `nZones` zones,
  *    the zone id is one more partition column (`__zone_user_id=K`),
  *    and the manifest records each zone's exact [min, max]. A range
  *    (or equality) predicate consults the manifest — driver-side,
  *    KBs — and reads only overlapping zone directories; the raw field
  *    stays a DATA column sorted within each file, so parquet row-group
  *    min/max statistics prune a second time inside each zone.
  *
  * Scale shape: build = one exact-percentile aggregate per integer
  * field + one partitioned rewrite (the same single exchange any
  * partitioned sink pays); query = directory listing + pruned scan.
  * The artifact is self-describing (schema DDL + field kinds + zone
  * map persisted beside the data) and reopens with [[PayloadIndex.load]].
  */
final class PayloadIndex private[api] (
    spark: SparkSession, val root: String,
    val fields: Seq[(String, String)], // (field, kind ∈ keyword|integer)
    val zones: Map[String, Seq[(Int, Long, Long)]], // field -> (zone, min, max)
    schemaDdl: String) {

  private val original = StructType.fromDDL(schemaDdl)
  private def kindOf(f: String): Option[String] = fields.find(_._1 == f).map(_._2)
  private def zoneCol(f: String) = s"__zone_$f"

  /** The read schema: data columns (original minus keyword fields, in
    * original order) + keyword partition columns (original types) +
    * zone partition columns. Explicit — partition-value type INFERENCE
    * would quietly retype a keyword like "007" as int.
    */
  private def readSchema: StructType = {
    val kw = fields.collect { case (f, "keyword") => f }.toSet
    StructType(
      original.filterNot(sf => kw.contains(sf.name)) ++
        original.filter(sf => kw.contains(sf.name)) ++
        fields.collect { case (f, "integer") =>
          StructField(zoneCol(f), IntegerType) })
  }

  /** Read the collection through the index with equality predicates on
    * keyword fields and [lo, hi] ranges on integer fields (equality on
    * an integer field is `(v, v)`). Every predicate prunes: keyword
    * values select their partition directories; integer ranges select
    * the manifest's overlapping zones (plus the exact residual filter,
    * which parquet row-group stats prune again inside each zone).
    * Columns come back in the original schema order.
    */
  def read(eq: Map[String, Seq[String]] = Map.empty,
           range: Map[String, (Long, Long)] = Map.empty): DataFrame = {
    var df = spark.read.schema(readSchema).parquet(s"$root/data")
    eq.foreach { case (f, vs) =>
      require(kindOf(f).contains("keyword"),
        s"'$f' is not an indexed keyword field (indexed: $fields)")
      df = df.filter(col(f).isin(vs: _*))
    }
    range.foreach { case (f, (lo, hi)) =>
      require(kindOf(f).contains("integer"),
        s"'$f' is not an indexed integer field (indexed: $fields)")
      val zs = zones(f).collect { case (z, zmin, zmax)
        if zmax >= lo && zmin <= hi => z }
      df = df.filter(col(zoneCol(f)).isin(zs.map(Integer.valueOf): _*) &&
        col(f) >= lo && col(f) <= hi)
    }
    df.select(original.map(sf => col(sf.name)): _*)
  }

  /** INCREMENTAL ingest — the [[AnnIndex.insert]] fixed-quantizer trade
    * on the payload axes: new rows assign to EXISTING zones (the zone
    * whose recorded range covers the value; a value in a gap or beyond
    * either end joins the nearest zone, WIDENING it) and APPEND into
    * the partitioned layout — keyword directories and parquet row-group
    * stats keep pruning with zero rewrite of existing files.
    *
    * Crash discipline, in write order: the WIDENED zone manifest
    * commits FIRST (next `gen-N` under `zones/` — tiny, one atomic
    * `_SUCCESS`), THEN the data appends. A crash between the two leaves
    * a manifest wider than the data — pruning stays CORRECT (a wider
    * zone can only select more directories, never miss a row); the
    * replayed insert re-widens idempotently (though the data rows
    * re-append: ingest is AT-LEAST-ONCE under replay — dedupe upstream
    * or rebuild, the [[AnnIndex.insert]] contract). The reverse order
    * would leave out-of-range rows invisible to range reads — silent
    * wrong answers, the one failure layout indexes must never have.
    *
    * The widened manifest merges against the NEWEST COMMITTED manifest
    * on disk, not just this object's (possibly stale) snapshot of it: a
    * stale handle committing its own view as a later generation would
    * UN-widen bounds another insert already published — the same
    * pruning-miss class, introduced through the side door.
    */
  def insert(batch: DataFrame): PayloadIndex = {
    require(batch.columns.toSet == original.map(_.name).toSet,
      s"batch columns ${batch.columns.toSeq} != indexed schema ${original.map(_.name)}")
    val normalized = batch.select(original.map(sf => col(sf.name)): _*)
    val integer = fields.collect { case (f, "integer") => f }
    // cached: the SAME materialization must feed both the manifest
    // stats and the data write — a non-deterministic batch re-evaluated
    // per pass could append rows the committed manifest does not cover
    // (a pruning miss, silent)
    val withZones = integer.foldLeft(normalized) { (df, f) =>
      val zs = zones(f).sortBy(_._1)
      // assignment boundary = each zone's recorded max (except the
      // last): index = #bounds below the value, mapped to the zone ID
      // (manifest zones can be sparse — creation-time ties leave holes)
      val idxCol = zs.init.map(_._3).foldLeft(lit(0)) { (acc, b) =>
        acc + when(col(f) > b, 1).otherwise(0) }
      df.withColumn(zoneCol(f),
        element_at(array(zs.map(z => lit(z._1)): _*), idxCol + 1))
    }.cache()
    // 1. widened manifest first (see ordering note above)
    val spark0 = spark
    import spark0.implicits._
    val widened: Map[String, Seq[(Int, Long, Long)]] =
      if (integer.isEmpty) zones
      else {
        val batchStats: Map[(String, Int), (Long, Long)] = integer.flatMap { f =>
          // null field values carry no range information (range reads
          // exclude nulls by SQL semantics) and an all-null zone group
          // would NPE the getLong below
          withZones.filter(col(f).isNotNull)
            .groupBy(col(zoneCol(f)).as("zone"))
            .agg(min(col(f)).cast("long").as("zmin"),
              max(col(f)).cast("long").as("zmax"))
            .collect().map(r => (f, r.getInt(0)) -> (r.getLong(1), r.getLong(2)))
        }.toMap
        // three-way merge: newest committed on-disk manifest ∪ this
        // handle's view ∪ the batch (see stale-handle note above)
        val disk: Map[String, Map[Int, (Long, Long)]] = spark
          .read.parquet(VectorIndex.resolveSnapshot(spark, s"$root/zones"))
          .collect()
          .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
          .groupBy(_._1).view
          .mapValues(_.map(t => t._2 -> (t._3, t._4)).toMap).toMap
        zones.map { case (f, zs) => f -> zs.map { case (z, zmin0, zmax0) =>
          val (dMin, dMax) = disk.getOrElse(f, Map.empty)
            .getOrElse(z, (zmin0, zmax0))
          val (zmin, zmax) = (math.min(zmin0, dMin), math.max(zmax0, dMax))
          batchStats.get((f, z)) match {
            case Some((bMin, bMax)) => (z, math.min(zmin, bMin), math.max(zmax, bMax))
            case None => (z, zmin, zmax)
          }
        } }
      }
    if (integer.nonEmpty) {
      val next = VectorIndex.nextGeneration(spark, s"$root/zones")
      widened.toSeq.flatMap { case (f, zs) => zs.map(z => (f, z._1, z._2, z._3)) }
        .toDF("field", "zone", "zmin", "zmax").coalesce(1)
        .write.parquet(s"$root/zones/${VectorIndex.generationDir(next)}")
    }
    // 2. data appends into the same partition axes
    val partCols = fields.collect { case (f, "keyword") => f } ++ integer.map(zoneCol)
    withZones
      .sortWithinPartitions((partCols ++ integer).map(col): _*)
      .write.mode("append").partitionBy(partCols: _*).parquet(s"$root/data")
    withZones.unpersist()
    new PayloadIndex(spark, root, fields, widened, schemaDdl)
  }
}

object PayloadIndex {

  private def zoneCol(f: String) = s"__zone_$f"

  /** Build the index layout for `points` at `root`. `keyword` fields
    * become partition columns, `integer` fields zone-bucketed partition
    * columns with a persisted zone map. Zone boundaries are EXACT
    * percentiles (one sort-based aggregate per field — a one-time build
    * cost, amortized like the bucketed-table exchange); ties simply
    * leave some zones empty. Refuses to overwrite an existing index —
    * the layout is APPEND-ONLY: grow it with [[PayloadIndex!.insert]]
    * (fixed zone boundaries, widened manifest), and when drift earns a
    * re-zone, rebuild into a fresh root and re-point the [[Aliases]]
    * entry (the rotation discipline).
    */
  def create(spark: SparkSession, points: DataFrame, root: String,
             keyword: Seq[String], integer: Seq[String],
             nZones: Int = 16): PayloadIndex = {
    val rootPath = new Path(s"$root/data")
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(rootPath), s"payload index already exists at $root")
    val cols = points.columns.toSet
    (keyword ++ integer).foreach(f =>
      require(cols.contains(f), s"field '$f' not in ${points.columns.toSeq}"))
    require(keyword.intersect(integer).isEmpty,
      s"fields cannot be both keyword and integer: ${keyword.intersect(integer)}")

    // zone assignment: value > boundary_i counts — an nZones-term
    // codegen'd when-sum, boundaries from one exact-percentile pass.
    // Cached: the SAME materialization must feed the data write and the
    // zone manifest (a non-deterministic `points` plan re-evaluated per
    // pass could write rows the manifest does not cover)
    val withZones = integer.foldLeft(points) { (df, f) =>
      val bounds = points
        .select(expr(s"percentile(`$f`, array(${
          (1 until nZones).map(i => i.toDouble / nZones).mkString(",")}))"))
        .head().getSeq[Double](0)
      df.withColumn(zoneCol(f),
        bounds.foldLeft(lit(0)) { (acc, b) =>
          acc + when(col(f) > b, 1).otherwise(0) })
    }.cache()
    val partCols = keyword ++ integer.map(zoneCol)
    withZones
      .repartition(partCols.map(col): _*)
      // sort files by the raw integer fields: row-group min/max stats
      // then prune INSIDE each zone directory too
      .sortWithinPartitions((partCols ++ integer).map(col): _*)
      .write.partitionBy(partCols: _*).parquet(s"$root/data")

    import spark.implicits._
    val fieldRows = keyword.map(_ -> "keyword") ++ integer.map(_ -> "integer")
    fieldRows.toDF("field", "kind").coalesce(1)
      .write.parquet(s"$root/fields")
    // exact per-zone [min, max] — the pruning map range reads consult
    // (nulls excluded: they carry no range information and an all-null
    // zone group would NPE the getLong)
    val zoneRows = integer.flatMap { f =>
      withZones.filter(col(f).isNotNull)
        .groupBy(col(zoneCol(f)).as("zone"))
        .agg(min(col(f)).cast("long").as("zmin"),
          max(col(f)).cast("long").as("zmax"))
        .collect().map(r => (f, r.getInt(0), r.getLong(1), r.getLong(2)))
    }
    // the manifest is generation-rotated ([[PayloadIndex!.insert]]
    // commits widened manifests as later generations; load resolves the
    // newest committed one)
    zoneRows.toDF("field", "zone", "zmin", "zmax").coalesce(1)
      .write.parquet(s"$root/zones/${VectorIndex.generationDir(0L)}")
    withZones.unpersist()
    val ddl = points.schema.toDDL
    val out = fs.create(new Path(root, "schema.ddl"), false)
    out.write(ddl.getBytes("UTF-8")); out.close()
    new PayloadIndex(spark, root, fieldRows,
      zoneRows.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4))).toMap,
      ddl)
  }

  /** Reopen a persisted index (manifest is driver-tiny). */
  def load(spark: SparkSession, root: String): PayloadIndex = {
    val fields = spark.read.parquet(s"$root/fields")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val zones = spark.read
      .parquet(VectorIndex.resolveSnapshot(spark, s"$root/zones"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4)).toSeq).toMap
    val p = new Path(root, "schema.ddl")
    val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
    val ddl = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    new PayloadIndex(spark, root, fields, zones, ddl)
  }
}
