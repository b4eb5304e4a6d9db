package graft.api

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Vectors._

/** Batch-built IVF index over an embedding corpus, persisted as a
  * cluster-partitioned parquet layout — the offline "index build" that
  * replaces the reference's per-point online Qdrant indexing
  * (/root/reference/insert.py:60-75) at data-pipeline scale.
  *
  * Build: MLlib KMeans (seeded → deterministic) fits the coarse
  * quantizer; the corpus is assigned in one map pass and written
  * `partitionBy(list)`; centroids persist alongside. Search: the nprobe
  * nearest centroids are picked DRIVER-side (centroids are nlist×dim —
  * KBs), and the scan reads ONLY those list directories — partition
  * pruning makes the probe I/O nprobe/nlist of the corpus, which is the
  * entire point of IVF at 100 TB. Scoring stays native-codegen; top-k
  * plans as TakeOrderedAndProject.
  */
class AnnIndex(spark: SparkSession, path: String,
               val centroids: Array[(Int, Array[Double])],
               val keywordFields: Seq[String] = Seq.empty) {

  private[api] def nearestLists(qvec: Seq[Double], nprobe: Int): Seq[Int] =
    centroids.map { case (cid, c) =>
      val d = c.zip(qvec).map { case (a, b) => (a - b) * (a - b) }.sum
      (d, cid)
    }.sortBy(identity).take(nprobe).map(_._2).toSeq

  /** Top-k cosine search probing `nprobe` inverted lists, with an
    * optional payload predicate (tenant/metadata filter — the
    * reference's `Filter(must=[user_id, ...])`, search.py:31-49).
    * The predicate applies INSIDE the probed scan, so it composes with
    * the list-partition pruning and pushes to parquet where possible.
    *
    * `eq` filters on the index's INDEXED keyword fields
    * ([[AnnIndex.build]]'s `keyword` axes — the [[PayloadIndex]]
    * discipline fused into the ANN layout): those predicates prune
    * DIRECTORIES, composing multiplicatively with the probe pruning —
    * at 100 TB a filtered search reads nprobe/nlist of the 1%-selective
    * payload slice, not nprobe/nlist of everything. Unindexed fields
    * are refused here (use `filter` for a residual scan predicate).
    */
  def search(qvec: Seq[Double], k: Int = 10, nprobe: Int = 4,
             filter: Option[Column] = None,
             eq: Map[String, Seq[String]] = Map.empty): DataFrame = {
    val probes = nearestLists(qvec, nprobe)
    val q = array(qvec.map(lit): _*)
    var scan = spark.read.parquet(path)
      .filter(col("list").isin(probes: _*)) // partition-pruned scan
    eq.foreach { case (f, vs) =>
      require(keywordFields.contains(f),
        s"'$f' is not an indexed keyword axis (indexed: $keywordFields)")
      scan = scan.filter(col(f).isin(vs: _*)) // directory-pruned too
    }
    filter.fold(scan)(scan.filter)
      .select(col("vec_id"), cosineSim(col("vec"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** [[search]] with the FULL Qdrant filter object (VERDICT r10 #5 —
    * the uniform `filter:` every Qdrant query mode takes, reaching the
    * ANN artifact). The tree is schema-validated and compiled in
    * FILTER context ([[Filters.toFilterColumn]]), so `must` conditions
    * on the layout's KEYWORD AXES stay raw partition-column
    * comparisons that Spark's catalog prunes to directories — they
    * compose MULTIPLICATIVELY with the probes' list pruning, exactly
    * the [[search]] `eq` route, while the rest of the tree rides the
    * probed scan as a pushed/residual predicate. Candidates are gated
    * BEFORE the top-k cut (the filtered-search discipline — a
    * post-filtered page would come up short).
    */
  def searchFilter(qvec: Seq[Double], filter: Filters.PFilter, k: Int = 10,
                   nprobe: Int = 4): DataFrame = {
    val probes = nearestLists(qvec, nprobe)
    val scan = spark.read.parquet(path)
      .filter(col("list").isin(probes: _*)) // partition-pruned scan
    val f2 = Filters.rewriteForSchema(filter, scan.schema)
      .asInstanceOf[Filters.PFilter]
    Filters.validateSchema(f2, scan.schema)
    scan.filter(Filters.toFilterColumn(f2))
      .select(col("vec_id"),
        cosineSim(col("vec"), array(qvec.map(lit): _*)).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Driver-side cardinality statistics, computed lazily once per
    * handle: per-list row counts and per-keyword-axis value counts
    * (nlist + Σ distinct rows — KBs). Both are PARTITION-COLUMN-only
    * aggregates: Spark reads directory names and parquet footers, never
    * vector data, so at 100 TB this costs a metadata pass, not a scan.
    * They feed the ADAPTIVE filtered search's candidate estimate
    * ([[planProbes]]) — the same role Qdrant's payload-index
    * cardinality estimation plays in its filtered-search planner.
    */
  private lazy val listCounts: Map[Int, Long] =
    spark.read.parquet(path).groupBy("list").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  private lazy val nRows: Long = math.max(1L, listCounts.values.sum)

  private lazy val keywordValueCounts: Map[String, Map[Option[String], Long]] =
    keywordFields.map { f =>
      f -> spark.read.parquet(path).groupBy(f).count().collect()
        .map(r => (if (r.isNullAt(0)) None else Some(r.get(0).toString))
          -> r.getLong(1)).toMap
    }.toMap

  /** Estimated selectivity of a filter tree from the KEYWORD-AXIS value
    * counts — exact shares for match value/any/except and is_null on
    * indexed axes, clause-combined (must multiplies, should/min_should
    * sum-capped, must_not complements). Conditions the axes cannot see
    * (ranges, text, nested — residual-only here) estimate 1.0, so the
    * result is an UPPER BOUND on true selectivity: the adaptive route
    * may under-widen when the driving condition is unindexed — index
    * the field as a keyword axis (or raise `candidateFactor`) when a
    * deployment filters selectively on it. Unknown `must_not` arms
    * contribute nothing (their complement of an unknown would be 0).
    */
  def estimateSelectivity(filter: Filters.PCond): Double = {
    import Filters._
    def known(c: PCond): Option[Double] = c match {
      case MatchValue(f, v) if keywordFields.contains(f) =>
        Some(keywordValueCounts(f).getOrElse(Some(v), 0L).toDouble / nRows)
      case MatchAny(f, vs) if keywordFields.contains(f) =>
        Some(vs.distinct.map(v =>
          keywordValueCounts(f).getOrElse(Some(v), 0L)).sum.toDouble / nRows)
      case MatchExcept(f, vs) if keywordFields.contains(f) =>
        Some(1.0 - vs.distinct.map(v =>
          keywordValueCounts(f).getOrElse(Some(v), 0L)).sum.toDouble / nRows)
      case IsNull(f) if keywordFields.contains(f) =>
        Some(keywordValueCounts(f).getOrElse(None, 0L).toDouble / nRows)
      case HasVector(f) if keywordFields.contains(f) =>
        Some(1.0 - keywordValueCounts(f).getOrElse(None, 0L).toDouble / nRows)
      case pf: PFilter => Some(estimateSelectivity(pf))
      case _ => None
    }
    filter match {
      case PFilter(must, should, mustNot, minShould) =>
        val mustSel = must.flatMap(known).product
        val shouldSel =
          if (should.isEmpty) 1.0
          else {
            val ks = should.map(known)
            if (ks.forall(_.isDefined)) math.min(1.0, ks.flatten.sum) else 1.0
          }
        val notSel = mustNot.flatMap(known).map(1.0 - _)
          .map(s => math.max(0.0, s)).product
        val msSel = minShould.map { case (cs, _) =>
          val ks = cs.map(known)
          if (ks.forall(_.isDefined)) math.min(1.0, ks.flatten.sum) else 1.0
        }.getOrElse(1.0)
        mustSel * shouldSel * notSel * msSel
      case other => known(other).getOrElse(1.0)
    }
  }

  /** The raw partitioned relation behind this index (payload axes and
    * `list` included) — the evaluation harnesses' batch entry point.
    */
  def points: DataFrame = spark.read.parquet(path)

  /** The ADAPTIVE probe plan — Qdrant's documented filtered-search
    * fallback (VERDICT r11 #1): a selective filter empties the probed
    * lists and recall silently collapses. Two engagement tiers, both
    * pure driver arithmetic over the KB-sized stats (no job):
    *
    *  1. FULL-SCAN SWITCH — when the filter's estimated total matches
    *     (corpus rows × estimated selectivity) fall below
    *     `fullScanThreshold`, serve the EXACT pruned scan (nprobe =
    *     nlist; keyword arms still prune directories, so "full scan"
    *     means the filtered slice, not the corpus). This is Qdrant's
    *     own plan switch (its `full_scan_threshold` index param), and
    *     it is deterministic — independent of list balance.
    *  2. PROBE WIDENING — otherwise, while the estimated candidate
    *     mass in the probed lists (probed rows × selectivity) is below
    *     `k * candidateFactor`, DOUBLE nprobe (capped at nlist).
    *
    * Returns the effective nprobe.
    */
  def planProbes(qvec: Seq[Double], filter: Filters.PFilter, k: Int,
                 nprobe: Int = 4, candidateFactor: Double = 4.0,
                 fullScanThreshold: Long = 4096L): Int = {
    require(nprobe >= 1 && k >= 1 && candidateFactor > 0,
      s"planProbes needs nprobe/k >= 1 and candidateFactor > 0 " +
        s"(got nprobe=$nprobe, k=$k, C=$candidateFactor)")
    val sel = estimateSelectivity(filter)
    val nlist = centroids.length
    if (nRows * sel < fullScanThreshold.toDouble) nlist
    else {
      def mass(np: Int): Double =
        nearestLists(qvec, np).map(listCounts.getOrElse(_, 0L)).sum * sel
      var np = math.min(nprobe, nlist)
      while (np < nlist && mass(np) < k * candidateFactor)
        np = math.min(np * 2, nlist)
      np
    }
  }

  /** [[searchFilter]] with the adaptive probe plan: recall under
    * selective filters no longer depends on the caller guessing
    * nprobe — the estimate widens the probe set (to the exact pruned
    * scan in the limit) exactly when the filter would starve it.
    */
  def searchFilterAdaptive(qvec: Seq[Double], filter: Filters.PFilter,
                           k: Int = 10, nprobe: Int = 4,
                           candidateFactor: Double = 4.0,
                           fullScanThreshold: Long = 4096L): DataFrame =
    searchFilter(qvec, filter, k,
      planProbes(qvec, filter, k, nprobe, candidateFactor, fullScanThreshold))

  /** INCREMENTAL insert — FAISS-style IVF `add`: new vectors assign to
    * their nearest EXISTING centroid (one map pass, centroids are a
    * plan-time literal matrix via the native argmin expression) and
    * APPEND into the partitioned layout. Unlike the graph index, IVF
    * maintenance rewrites nothing — new parquet files land inside the
    * assigned list directories, searches pick them up on the next scan,
    * and partition pruning is untouched. The quantizer itself does not
    * move (the standard trade: lists drift from optimal as the
    * distribution shifts; rebuild when the imbalance audit —
    * `keys_skew_audit`-style over `list` — says so).
    */
  def insert(batch: DataFrame): AnnIndex = {
    val cents = centroids.map { case (i, c) => (i.toLong, c.toSeq) }.toSeq
    batch
      .withColumn("list",
        graft.functions.Vectors.nearestCentroidId(col("vec"), cents).cast("int"))
      .write.mode("append")
      .partitionBy(keywordFields :+ "list": _*) // same axes as build
      .parquet(path)
    this
  }

  /** EXACTLY-ONCE ingest step — [[insert]] under the shared
    * [[CommitProtocol]] (the foreachBatch body of
    * [[graft.streaming.EventStreams.annMaintainStream]], closing the
    * same at-least-once residue [[PayloadIndex!.insertCommitted]]
    * closed for the payload layout): marker skip → intent-scoped torn
    * sweep → stage the assigned batch as a partitioned write → intent →
    * rename-in with `bN-` prefixes → marker. Assignment itself is
    * [[insert]]'s — nearest EXISTING centroid, same partition axes —
    * so searches and the imbalance audit see replayed batches exactly
    * once. Bookkeeping (`_meta/batches`, `_staging`) lives BESIDE the
    * layout: the data tree is the flat `spark.read.parquet(path)`
    * relation, and a sub-directory would read as data.
    */
  def insertCommitted(batch: DataFrame, batchId: Long): AnnIndex = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaRoot = path + "_meta"
    if (CommitProtocol.isCommitted(fs, metaRoot, batchId)) return this
    CommitProtocol.sweepTorn(fs, metaRoot, path, batchId)
    val staging = s"${path}_staging/b$batchId"
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    val cents = centroids.map { case (i, c) => (i.toLong, c.toSeq) }.toSeq
    batch
      .withColumn("list",
        graft.functions.Vectors.nearestCentroidId(col("vec"), cents).cast("int"))
      .write.partitionBy(keywordFields :+ "list": _*)
      .parquet(staging)
    CommitProtocol.publish(fs, metaRoot, path, batchId,
      Seq((new org.apache.hadoop.fs.Path(staging), "")))
    fs.delete(new org.apache.hadoop.fs.Path(s"${path}_staging/b$batchId"), true)
    this
  }

  /** LIST-IMBALANCE audit — the rebuild trigger for [[insert]]'s fixed
    * quantizer: per-list population plus the max/mean skew ratio (an
    * IVF probe reads whole lists, so a hot list is a hot probe — the
    * same math as the shuffle-key skew audit, over the index layout).
    * One partition-column aggregate; no vector data read.
    */
  def imbalanceAudit(): DataFrame = {
    val perList = spark.read.parquet(path).groupBy("list")
      .agg(count(lit(1)).as("n"))
    perList.agg(
        count(lit(1)).as("n_lists"), sum("n").as("n_vectors"),
        max("n").as("max_list"), min("n").as("min_list"))
      .select(col("n_lists"), col("n_vectors"), col("max_list"), col("min_list"),
        round(col("max_list") * col("n_lists").cast("double") / col("n_vectors"), 4)
          .as("skew_ratio"))
  }
}

object AnnIndex {

  /** Fit the coarse quantizer and persist the partitioned layout.
    * `corpus` must have (vec_id BIGINT, vec ARRAY<DOUBLE>); any extra
    * columns ride along as payload and are filterable at search time.
    *
    * `keyword` fields (low-cardinality payload tags — the
    * [[graft.operators.VectorStore.payloadIndexPlan]] advisor's
    * `keyword` verdicts) become ADDITIONAL partition axes alongside the
    * IVF list: `site=X/…/list=L/`. A filtered search then prunes
    * directories on BOTH axes at once — Qdrant's filtered-search-over-
    * payload-index capability fused into the ANN layout rather than
    * bolted beside it. Directory count is ∏ distinct × nlist, which is
    * exactly why the advisor's ≤64-distinct criterion gates what may be
    * a keyword axis. Keyword axes are STRING tags by contract
    * (site/lang-class); a value that LOOKS numeric ("007") would be
    * retyped by partition-value inference on read — index such fields
    * with [[PayloadIndex]] (explicit read schema) instead.
    */
  def build(corpus: DataFrame, path: String, nlist: Int = 16,
            seed: Long = 42L, maxIter: Int = 5,
            keyword: Seq[String] = Seq.empty): AnnIndex = {
    val spark = corpus.sparkSession
    keyword.foreach(f => require(corpus.columns.contains(f),
      s"keyword field '$f' not in ${corpus.columns.toSeq}"))
    val feat = corpus.withColumn("features", array_to_vector(col("vec")))
    val model = new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features").setPredictionCol("list")
      .fit(feat)
    model.transform(feat)
      .drop("features")
      .write.mode("overwrite")
      .partitionBy(keyword :+ "list": _*)
      .parquet(path)
    val cents = model.clusterCenters.zipWithIndex
      .map { case (v, i) => (i, v.toArray) }
    import spark.implicits._
    cents.toSeq.toDF("cid", "centroid")
      .write.mode("overwrite").parquet(path + "_centroids")
    // ALWAYS written (possibly empty): an in-place rebuild WITHOUT
    // keyword axes must not leave a stale manifest from a previous
    // keyword-partitioned build — load would then claim axes the new
    // layout does not have (insert would mix partition depths, eq reads
    // would claim pruning that never happens)
    keyword.toDF("field").coalesce(1)
      .write.mode("overwrite").parquet(path + "_fields")
    new AnnIndex(spark, path, cents, keyword)
  }

  /** Reopen a persisted index (centroids — and the keyword-axis
    * manifest, when the layout has one — reload to the driver).
    */
  def load(spark: SparkSession, path: String): AnnIndex = {
    val cents = spark.read.parquet(path + "_centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val fieldsPath = new org.apache.hadoop.fs.Path(path + "_fields")
    val fs = fieldsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keyword =
      if (fs.exists(fieldsPath))
        spark.read.parquet(path + "_fields").collect().map(_.getString(0)).toSeq
      else Seq.empty
    new AnnIndex(spark, path, cents, keyword)
  }
}
