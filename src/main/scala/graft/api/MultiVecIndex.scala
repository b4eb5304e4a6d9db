package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Vectors._

/** MULTIVECTOR (ColBERT late-interaction) SERVING ARTIFACT — VERDICT
  * r11 #4: the scan-route `vs_multivec_maxsim` operator is the correct
  * max_sim semantics, but Qdrant serves multivectors from its ANN
  * structures; a max_sim query must not pay a full corpus scan. This
  * artifact stores PER-TOKEN vectors as an [[AnnIndex]] relation keyed
  * by (doc, token) — `doc` rides the IVF layout as a payload column —
  * and serves the standard two-stage ColBERT shape:
  *
  *  1. CANDIDATE GENERATION — each query token probes its `nprobe`
  *     nearest token lists and keeps its `tokenK` nearest corpus
  *     TOKENS; the union of their parent docs is the candidate set
  *     (≤ |query tokens| × tokenK docs). One partition-pruned scan for
  *     all query tokens at once: the (token, probed list) pairs
  *     broadcast, each probed corpus token scores only against the
  *     query tokens that probed its list.
  *  2. EXACT max_sim RERANK — candidate docs' token groups (a
  *     broadcast semi-join gate; the corpus never shuffles) score the
  *     full Σ-of-max-cosine against the broadcast query batch, with
  *     the scan operator's exact-decimal discipline (per-token maxes
  *     round 6dp, sum as DECIMAL), so on the candidate set the rerank
  *     is BIT-IDENTICAL to the brute operator.
  *
  * Approximate exactly like single-vector IVF serving: a doc whose
  * every token misses every query token's probe set cannot be
  * generated — recall-spec'd (with the exact anchor at nprobe = nlist,
  * tokenK ≥ corpus tokens), not oracle-checked.
  *
  * Scale shape: stage 1 reads nprobe/nlist of the TOKEN corpus
  * (directory-pruned) and exchanges only (token id, doc, score)
  * triples for the per-token cut; stage 2 reads the candidate docs'
  * token rows and partial-aggregates — vectors never cross an exchange
  * in either stage (plan-spec'd).
  */
class MultiVecIndex(spark: SparkSession, val ann: AnnIndex) {

  /** max_sim top-k: `queryTokens` is the query's token-vector batch
    * (bounded — a ColBERT query is ≤ a few dozen vectors, driver
    * state by construction). `excludeDoc` drops one document (the
    * more-like-this form where the query IS an indexed doc).
    */
  def search(queryTokens: Seq[Seq[Double]], k: Int = 10, nprobe: Int = 4,
             tokenK: Int = 32, excludeDoc: Option[Long] = None): DataFrame = {
    require(queryTokens.nonEmpty, "multivector query needs at least one token vector")
    require(k >= 1 && nprobe >= 1 && tokenK >= 1,
      s"k/nprobe/tokenK must be >= 1 (got k=$k, nprobe=$nprobe, tokenK=$tokenK)")
    import spark.implicits._
    val qdf = queryTokens.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("qt", "qvec")
    // stage 1: (query token, probed list) pairs broadcast — ONE
    // partition-pruned scan serves every query token's probe
    val probes = queryTokens.zipWithIndex.flatMap { case (v, i) =>
      ann.nearestLists(v, nprobe).map(l => (i.toLong, v, l))
    }.toDF("qt", "qvec", "list")
    val probeLists = queryTokens.flatMap(v =>
      ann.nearestLists(v, nprobe)).distinct
    val pts = ann.points
    val probed = pts
      .filter(col("list").isin(probeLists.map(Integer.valueOf): _*))
      .join(broadcast(probes), "list")
      .withColumn("cos", cosineSim(col("vec"), col("qvec")))
      .select(col("qt"), col("doc"), col("vec_id"), col("cos"))
    val nearTokens = graft.plans.TopK.perKey(probed,
      Seq(col("qt")), Seq(col("cos").desc, col("vec_id").asc), tokenK)
    val candDocs = excludeDoc.fold(nearTokens)(d =>
      nearTokens.filter(col("doc") =!= d))
      .select("doc").distinct()
    // stage 2: exact max_sim over the candidate docs' token groups —
    // the broadcast semi-join gates the scan, vectors stay map-side
    val gated = excludeDoc.fold(pts)(d => pts.filter(col("doc") =!= d))
      .join(broadcast(candDocs), Seq("doc"), "left_semi")
    gated.join(broadcast(qdf))
      .withColumn("cos", cosineSim(col("vec"), col("qvec")))
      .groupBy("doc", "qt").agg(max("cos").as("mx"))
      .withColumn("mx6", round(col("mx"), 6).cast("decimal(18,6)"))
      .groupBy("doc").agg(sum("mx6").as("sc"))
      .orderBy(col("sc").desc, col("doc"))
      .limit(k)
      // exact 6dp-decimal sum, unrounded cast — the scan operator's
      // exactness discipline, bit-identical on the candidate set
      .select(col("doc"), col("sc").cast("double").as("maxsim"))
  }

  /** DOCUMENT UPSERT as a snapshot rotation (the streaming maintain's
    * merge step — VERDICT r12 #6): `batch` carries (doc, vec_id, vec)
    * token rows; docs present in the batch REPLACE their stored token
    * bags (a re-encoded document's token count may change — append
    * would leave stale tokens scoring), new docs insert. Survivor
    * token rows rewrite beside the assigned batch under the SAME list
    * partitioning and the SAME quantizer (nearest EXISTING centroid —
    * the [[AnnIndex!.insert]] fixed-quantizer trade), into a FRESH
    * layout at `dstPath`: mode-overwrite, so a torn prior attempt at
    * the same destination is replaced whole. Deterministic given the
    * inputs — a replayed batch re-lands the identical generation.
    */
  def upsertTo(batch: DataFrame, dstPath: String): MultiVecIndex = {
    val cols = batch.columns.toSet
    Seq("doc", "vec_id", "vec").foreach(c => require(cols.contains(c),
      s"token batch needs column '$c' (got ${batch.columns.toSeq})"))
    val cents = ann.centroids.map { case (i, c) => (i.toLong, c.toSeq) }.toSeq
    val batchDocs = batch.select("doc").distinct()
    val survivors = ann.points
      .join(broadcast(batchDocs), Seq("doc"), "left_anti")
      .select("doc", "vec_id", "vec", "list")
    val assigned = batch.select(col("doc"), col("vec_id"), col("vec"),
      graft.functions.Vectors.nearestCentroidId(col("vec"), cents)
        .cast("int").as("list"))
    survivors.unionByName(assigned)
      .write.mode("overwrite").partitionBy("list").parquet(dstPath)
    // the quantizer and (empty) axis manifest travel — the rotated
    // generation reopens through the ordinary AnnIndex.load
    import batch.sparkSession.implicits._
    ann.centroids.toSeq.map { case (i, c) => (i, c.toSeq) }
      .toDF("cid", "centroid")
      .write.mode("overwrite").parquet(dstPath + "_centroids")
    Seq.empty[String].toDF("field").coalesce(1)
      .write.mode("overwrite").parquet(dstPath + "_fields")
    MultiVecIndex.load(spark, dstPath)
  }

  /** DOCUMENT DELETE as a snapshot rotation (VERDICT r12 #2's MultiVec
    * arm — the artifact was build/load only, so removing a document
    * from a served multivector collection meant rebuild-or-serve-
    * stale): the named docs' token rows are deleted through
    * [[AnnIndex!.deleteTo]]'s rotation (survivor token rows rewrite
    * under the same list partitioning and the SAME quantizer; `doc` is
    * a payload column, so every list directory rewrites — honest, the
    * token layout has no doc axis to prune on). Serving correctness
    * needs nothing else: stage 1 candidates and stage 2 gates both key
    * on the rotated relation, and the candidate path already tolerates
    * over-selection, so a rotated index simply never generates nor
    * reranks the deleted docs (parity-spec'd against the pre-delete
    * index with the docs excluded).
    */
  def deleteTo(dstPath: String, docs: Seq[Long]): MultiVecIndex = {
    require(docs.nonEmpty, "deleteTo needs at least one doc id")
    new MultiVecIndex(spark, ann.deleteTo(dstPath,
      Filters.PFilter(must = Seq(Filters.HasId("doc", docs)))))
  }

  /** The token vectors of one indexed document, driver-collected (a
    * document's token bag is bounded — query-vector-sized state): the
    * more-like-this entry point's lookup.
    */
  def tokensOf(doc: Long): Seq[Seq[Double]] = {
    val rows = ann.points.filter(col("doc") === doc)
      .select("vec_id", "vec").collect()
    require(rows.nonEmpty, s"doc $doc has no token vectors in this index")
    rows.sortBy(_.getLong(0)).map(_.getSeq[Double](1)).toSeq
  }
}

object MultiVecIndex {

  /** Build the token-level IVF layout. `tokens` must have (doc BIGINT,
    * vec_id BIGINT — globally unique token id, vec ARRAY<DOUBLE>);
    * `doc` rides as a payload column of the list-partitioned layout.
    */
  def build(tokens: DataFrame, path: String, nlist: Int = 16,
            seed: Long = 42L): MultiVecIndex = {
    val cols = tokens.columns.toSet
    Seq("doc", "vec_id", "vec").foreach(c => require(cols.contains(c),
      s"token relation needs column '$c' (got ${tokens.columns.toSeq})"))
    new MultiVecIndex(tokens.sparkSession,
      AnnIndex.build(tokens, path, nlist, seed))
  }

  /** Reopen a persisted token layout. */
  def load(spark: SparkSession, path: String): MultiVecIndex =
    new MultiVecIndex(spark, AnnIndex.load(spark, path))

  // a committed generation = the data tree and both sidecars all left
  // their parquet _SUCCESS (the sidecars live INSIDE the generation
  // dir — `gen-N/ivf`, `gen-N/ivf_centroids`, `gen-N/ivf_fields` — so
  // generation GC is one directory delete)
  private val relations = Seq("ivf", "ivf_centroids", "ivf_fields")

  /** The newest FULLY-COMMITTED generation's INDEX PATH under a
    * maintenance root ([[graft.streaming.EventStreams
    * .multivecMaintainStream]] writes `gen-N/ivf` layouts) — the
    * GraphIndex rotation discipline on the token artifact.
    */
  def resolveLive(spark: SparkSession, root: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("gen-"))
      .map(_.getPath).sortBy(_.getName)
      .filter(g => relations.forall(r =>
        fs.exists(new org.apache.hadoop.fs.Path(g, s"$r/_SUCCESS"))))
      .lastOption.map(g => s"$g/ivf")
  }

  /** Open the live generation of a streaming-maintained root. */
  def openLive(spark: SparkSession, root: String): MultiVecIndex =
    load(spark, resolveLive(spark, root).getOrElse(
      throw new IllegalArgumentException(
        s"no committed multivector generation under $root")))

  /** True iff `gen-<batchId>` is FULLY committed — the replay-skip
    * test, keyed on THIS generation's own commit, never the live name
    * (the ADVICE r12 rationale on [[GraphIndex.isGenerationCommitted]]).
    */
  def isGenerationCommitted(spark: SparkSession, root: String,
                            batchId: Long): Boolean = {
    val g = new org.apache.hadoop.fs.Path(root,
      VectorIndex.generationDir(batchId))
    val fs = g.getFileSystem(spark.sparkContext.hadoopConfiguration)
    relations.forall(r =>
      fs.exists(new org.apache.hadoop.fs.Path(g, s"$r/_SUCCESS")))
  }
}
