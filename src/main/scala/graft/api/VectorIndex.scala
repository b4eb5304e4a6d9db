package graft.api

import graft.functions.Vectors._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The user-facing analogue of the reference service
  * (/root/reference/app.py): a multi-tenant vector collection with
  * upsert / filtered top-k search / predicate deletes / nearest-centroid
  * classification — as an immutable, lazily-evaluated Spark library.
  *
  * Endpoint mapping:
  * {{{
  *   /insert              -> index.upsert(batch)            (app.py:36-54)
  *   /search              -> index.search(qvec, user, k)    (app.py:57-75)
  *   /remove_by_user      -> index.deleteByUser(u)          (app.py:79-91)
  *   /remove_all_by_word  -> index.deleteByWord(u, w)       (app.py:94-115)
  *   /remove_all_by_regex -> index.deleteByRegex(u, re)     (app.py:118-139)
  *   /get_category_for_title -> VectorIndex.classify        (app.py:142-168)
  * }}}
  *
  * Scale design: `save` lays the collection out bucketed by
  * `hash(user_id) % nBuckets` as a partition column, so every
  * tenant-scoped operation prunes to 1/nBuckets of a 100 TB collection
  * at the parquet-scan level (visible as PartitionFilters in the plan).
  * Snapshots are immutable — upsert/delete return a new logical plan,
  * merged physically on the next save (the lakehouse analogue of
  * Qdrant's mutable collection).
  */
class VectorIndex private (val points: DataFrame,
                           val embedder: Embedder = FeatureHashEmbedder) {

  import VectorIndex._

  /** Last-write-wins merge of a new batch (same schema) by point id —
    * insert.py:72 upsert semantics. `seq` orders versions.
    */
  def upsert(batch: DataFrame): VectorIndex = {
    // the loud core-schema guard FIRST: allowMissingColumns below must
    // only ever forgive EXTRA payload/named-vector columns — a batch
    // missing a core column (misnamed vector, no id/seq) would union as
    // NULLs and corrupt silently (NULL ids collapse to one survivor
    // under the id window)
    require(VectorIndex.schema.forall(batch.columns.contains),
      s"upsert batch must have columns ${VectorIndex.schema}, " +
        s"got ${batch.columns.toSeq}")
    val w = Window.partitionBy("id").orderBy(col("seq").desc)
    // allowMissingColumns: a collection may carry extra payload /
    // named-vector columns beyond the canonical seven — a batch without
    // them upserts with NULL payload (and vice versa), instead of
    // refusing on column-count mismatch
    new VectorIndex(points.unionByName(batch, allowMissingColumns = true)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1).drop("__rk"), embedder)
  }

  /** Point retrieval by ids — the Qdrant points-GET endpoint: a pushed
    * IN predicate (row-group skipping at the scan on an id-sorted
    * layout), no distance work.
    */
  def retrieve(ids: Seq[Long]): DataFrame =
    points.filter(col("id").isin(ids: _*)).orderBy("id")

  /** Generic predicate delete (FilterSelector analogue). */
  def delete(predicate: Column): VectorIndex =
    new VectorIndex(points.filter(!predicate), embedder)

  def deleteByUser(userId: Long): VectorIndex =
    delete(col("user_id") === userId)

  def deleteByWord(userId: Long, word: String): VectorIndex =
    delete(col("user_id") === userId && col("text").contains(word))

  def deleteByRegex(userId: Long, regex: String): VectorIndex =
    delete(col("user_id") === userId && col("text").rlike(regex))

  /** Filtered top-k for one query vector — /search. Returns
    * (rank, id, string, score) like the reference's JSON rows
    * (search.py:73 `{"id", "string", "score"}`).
    */
  def search(qvec: Seq[Double], userId: Long, k: Int,
             site: Option[String] = None, lang: Option[String] = None,
             metric: (Column, Column) => Column = l2Distance): DataFrame = {
    val filtered = Seq(
      Some(col("user_id") === userId),
      site.map(col("site") === _),
      lang.map(col("lang") === _)).flatten.reduce(_ && _)
    val scored = points.filter(filtered)
      .withColumn("score", metric(lit(qvec.toArray), col("vector")))
      .orderBy(col("score").asc, col("id").asc)
      .limit(k) // TakeOrderedAndProject: per-partition top-k, k-row merge
    // lit partition key = same one-partition run over k rows, no
    // unpartitioned-window warning
    scored.withColumn("rank", row_number().over(
      Window.partitionBy(lit(0)).orderBy(col("score").asc, col("id").asc)))
      .select(col("rank"), col("id"), col("text").as("string"), col("score"))
  }

  /** [[search]] with the FULL Qdrant filter object — `/points/query`
    * with a `filter:` carrying `should` / `must_not` / `min_should` /
    * nested conditions (the reference only ever builds the must-list
    * of this same object, search.py:37-49). The tree compiles to one
    * total-boolean pushed predicate ([[Filters.toColumn]] — Qdrant
    * two-valued NULL semantics); ranking is the [[search]] top-k.
    */
  def searchFilter(qvec: Seq[Double], filter: Filters.PFilter, k: Int,
                   metric: (Column, Column) => Column = l2Distance)
      : DataFrame = {
    val scored = points.filter(Filters.toFilterColumn(prepared(filter)))
      .withColumn("score", metric(lit(qvec.toArray), col("vector")))
      .orderBy(col("score").asc, col("id").asc)
      .limit(k)
    scored.withColumn("rank", row_number().over(
      Window.partitionBy(lit(0)).orderBy(col("score").asc, col("id").asc)))
      .select(col("rank"), col("id"), col("text").as("string"), col("score"))
  }

  /** Validated, schema-rewritten filter tree — the shared front door of
    * every filter-object surface here (ADVICE r10: an unknown field or
    * wrong-typed condition must refuse with the contract's loud
    * IllegalArgumentException at the API boundary, not surface as a raw
    * AnalysisException deep in plan analysis; and `is_empty` over a
    * scalar column rewrites to `is_null` — the [[PayloadIndex]]
    * schema-awareness on the plain collection route).
    */
  private def prepared(filter: Filters.PFilter): Filters.PFilter = {
    val f2 = Filters.rewriteForSchema(filter, points.schema)
      .asInstanceOf[Filters.PFilter]
    Filters.validateSchema(f2, points.schema)
    f2
  }

  /** Qdrant FilterSelector delete: remove every point MATCHING the
    * filter object. Two-valued semantics cut both ways — a NULL
    * payload matches no value condition, so it SURVIVES a value-
    * condition delete (`deleteByFilter(lang = "de")` keeps NULL-lang
    * rows; delete them explicitly with [[Filters.IsNull]]).
    */
  def deleteByFilter(filter: Filters.PFilter): VectorIndex = {
    // a match-all (accidentally-empty) filter object on the DESTRUCTIVE
    // path refuses loudly — truncation is an explicit predicate, not a
    // default (ADVICE r11; read paths keep Qdrant's match-all)
    require(!Filters.matchesAll(filter),
      "deleteByFilter refuses an all-empty (match-all) filter — " +
        "truncate explicitly with delete(lit(true)) if that is the intent")
    delete(Filters.toColumn(prepared(filter)))
  }

  /** Qdrant `/points/count` with a filter object (`exact: true`). */
  def countByFilter(filter: Filters.PFilter): Long =
    points.filter(Filters.toFilterColumn(prepared(filter))).count()

  /** Qdrant `update_vectors` (VERDICT r12 #4 — the vector-patch
    * sibling of set_payload: re-embedding a SUBSET of points is routine
    * in the reference's insert flow, and re-upserting whole points for
    * it rewrites payload that did not change): `patch` carries `id`
    * plus any subset of the collection's VECTOR COLUMNS (the canonical
    * `vector` and/or named heads — each name is its own column here);
    * listed columns replace per id, every other row AND every other
    * column keeps its stored value. Broadcast LEFT join + coalesce —
    * the [[graft.operators.VectorStore.setPayload]] shape, one map
    * pass, the collection never shuffles. A NULL patch value keeps the
    * stored vector (removal is [[deleteVectors]] — explicit, never a
    * silent NULL side-effect); ids absent from the collection are
    * ignored (Qdrant 404s per point; a set-oriented patch simply has
    * nothing to join them to). Unknown columns refuse loudly — named
    * vectors are declared by the collection schema, and silently
    * adding a column would diverge from Qdrant's model.
    */
  def setVectors(patch: DataFrame): VectorIndex = {
    require(patch.columns.contains("id"),
      s"vector patch needs an 'id' column (got ${patch.columns.toSeq})")
    val vecCols = patch.columns.filterNot(_ == "id").toSeq
    require(vecCols.nonEmpty, "vector patch needs at least one vector column")
    vecCols.foreach(c => require(points.columns.contains(c),
      s"unknown vector column '$c' — this collection carries " +
        s"${points.columns.toSeq}; named vectors are declared at creation"))
    val renamed = patch.select(col("id").as("__pid") +:
      vecCols.map(c => col(c).as(s"__u_$c")): _*)
    val joined = points.join(broadcast(renamed),
      col("id") === col("__pid"), "left")
    val outCols = points.columns.toSeq.map { c =>
      if (vecCols.contains(c)) coalesce(col(s"__u_$c"), col(c)).as(c)
      else col(c)
    }
    new VectorIndex(joined.select(outCols: _*), embedder)
  }

  /** Qdrant `delete_vectors` — remove the NAMED heads `names` from the
    * points `ids`: the columns null out for those rows, and presence
    * composes exactly as Qdrant documents — [[Filters.HasVector]] (a
    * NOT-NULL pushed predicate here) then excludes them from any
    * filtered search. The canonical `vector` refuses: a point without
    * its primary vector is a point DELETE ([[delete]]), not a patch —
    * silently nulling it would leave unservable rows in every search.
    */
  def deleteVectors(ids: Seq[Long], names: Seq[String]): VectorIndex = {
    require(ids.nonEmpty && names.nonEmpty,
      "delete_vectors needs point ids and vector names")
    require(!names.contains("vector"),
      "the primary 'vector' cannot be deleted per point — delete the " +
        "point itself (delete/deleteByFilter) if that is the intent")
    names.foreach(c => require(points.columns.contains(c),
      s"unknown vector column '$c' — this collection carries " +
        s"${points.columns.toSeq}"))
    val doomed = col("id").isin(ids: _*)
    val outCols = points.columns.toSeq.map { c =>
      if (names.contains(c))
        when(doomed, lit(null).cast(points.schema(c).dataType))
          .otherwise(col(c)).as(c)
      else col(c)
    }
    new VectorIndex(points.select(outCols: _*), embedder)
  }

  /** Text-query search — the full /search flow (search.py:31-49): embed
    * the query string with the SAME [[Embedder]] the collection was
    * built with, then run the filtered top-k. The single-row query
    * embedding runs as a tiny Spark job (one collect), keeping query-
    * and corpus-embedding code identical by construction.
    */
  def searchText(query: String, userId: Long, k: Int): DataFrame = {
    val s = points.sparkSession
    import s.implicits._
    val qvec = embedder.embed(Seq((0L, query)).toDF("doc_id", "text"))
      .head().getSeq[Double](1)
    search(qvec, userId, k)
  }

  /** Positive/negative example recommendation — Qdrant's /recommend
    * (average_vector strategy): rank by cosine similarity to
    * mean(positive example vectors) − mean(negative example vectors),
    * excluding the examples themselves. Example vectors are looked up
    * in the collection by point id, the recommendation direction is
    * computed distributed (posexplode → per-dim aggregate → one-row
    * broadcast), and the corpus ranks with a k-row TakeOrdered cut —
    * the corpus never shuffles. Cosine is scale-invariant, so the
    * means are combined in the exact integer-weighted decimal form
    * n_neg·Σpos − n_pos·Σneg (no division; reproducible anywhere).
    */
  def recommend(posIds: Seq[Long], negIds: Seq[Long] = Nil, k: Int = 10,
                userId: Option[Long] = None): DataFrame = {
    require(posIds.nonEmpty, "recommend needs at least one positive example")
    val dec = "decimal(18,10)"
    val exampleIds = (posIds ++ negIds).map(Long.box)
    val isPos = col("id").isin(posIds.map(Long.box): _*)
    val negWeight = math.max(negIds.size, 1) // no negatives: rec = Σpos
    val ex = points.filter(col("id").isin(exampleIds: _*))
      .select(col("id"), posexplode(col("vector")).as(Seq("dim", "v")))
    val recDims = ex.groupBy("dim").agg(
      ((lit(negWeight) * sum(when(isPos, col("v").cast(dec)).otherwise(lit(0).cast(dec)))) -
        (lit(posIds.size) * sum(when(!isPos, col("v").cast(dec)).otherwise(lit(0).cast(dec)))))
        .cast("double").as("rv"))
    val qvec = recDims.agg(
      transform(array_sort(collect_list(struct(col("dim"), col("rv")))),
        x => x.getField("rv")).as("qvec"))
    val base = userId.map(u => points.filter(col("user_id") === u)).getOrElse(points)
    base.filter(!col("id").isin(exampleIds: _*))
      .join(broadcast(qvec))
      .withColumn("score", cosineSim(col("qvec"), col("vector")))
      .orderBy(col("score").desc, col("id").asc).limit(k)
      .withColumn("rank", row_number().over(
        Window.partitionBy(lit(0)).orderBy(col("score").desc, col("id").asc)))
      .select(col("rank"), col("id"), col("text").as("string"), col("score"))
  }

  /** Discovery search (Qdrant /points/discover): rank by the context
    * score Σ min(0, cos(v,pos)−cos(v,neg)) over example pairs, then by
    * similarity to `targetId`'s vector. Example vectors collect once
    * (a bounded client batch) and inline as literals — one map pass over
    * the (optionally tenant-pruned) corpus + a k-row TakeOrdered.
    */
  def discover(targetId: Long, pairs: Seq[(Long, Long)], k: Int = 10,
               userId: Option[Long] = None): DataFrame = {
    require(pairs.nonEmpty, "discover needs at least one context pair")
    val exIds = (targetId +: pairs.flatMap(p => Seq(p._1, p._2))).distinct
    val vecs = exampleVecs(exIds, "discovery")
    def litVec(id: Long): Column = array(vecs(id).map(lit): _*)
    val ctx = contextScore(pairs, vecs)
    val base = userId.map(u => points.filter(col("user_id") === u)).getOrElse(points)
    base.filter(!col("id").isin(exIds.map(Long.box): _*))
      .withColumn("ctx_score", ctx)
      .withColumn("target_cos", cosineSim(col("vector"), litVec(targetId)))
      .orderBy(col("ctx_score").desc, col("target_cos").desc, col("id"))
      .limit(k)
      .select(col("id"), col("text").as("string"), col("ctx_score"), col("target_cos"))
  }

  /** Collect + validate a bounded example-id batch's vectors — the
    * shared front of [[discover]] and [[contextSearch]] (one collect,
    * loud refusal on a missing id).
    */
  private def exampleVecs(ids: Seq[Long], what: String): Map[Long, Seq[Double]] = {
    val vecs = points.filter(col("id").isin(ids.map(Long.box): _*))
      .select(col("id"), col("vector")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    ids.foreach(id => require(vecs.contains(id),
      s"$what example point $id is not in the collection"))
    vecs
  }

  /** Qdrant's context score: Σ min(0, cos(v,pos) − cos(v,neg)) over
    * the example pairs (shared by both discovery modes).
    */
  private def contextScore(pairs: Seq[(Long, Long)],
                           vecs: Map[Long, Seq[Double]]): Column =
    pairs.map { case (p, n) =>
      least(lit(0.0),
        cosineSim(col("vector"), array(vecs(p).map(lit): _*)) -
          cosineSim(col("vector"), array(vecs(n).map(lit): _*)))
    }.reduce(_ + _)

  /** CONTEXT-ONLY discovery (Qdrant /points/query with `context:` and
    * NO target — VERDICT r10 #4, the "browse away from negatives"
    * mode): rank by the context score alone, Σ min(0, cos(v,pos) −
    * cos(v,neg)) over the example pairs — a point scores 0 (best) when
    * it sits on the positive side of EVERY pair's bisecting boundary,
    * and each violated pair subtracts its margin. Ties (the whole
    * 0-scoring region, typically many points) break by id — Qdrant
    * documents context results as unordered within a score, so any
    * deterministic tie-break is faithful; id is this library's
    * convention. Same physical shape as [[discover]]: example vectors
    * collect once (bounded client batch) and inline as literals, one
    * map pass over the (optionally tenant-pruned) corpus, k-row
    * TakeOrdered — the corpus never shuffles.
    */
  def contextSearch(pairs: Seq[(Long, Long)], k: Int = 10,
                    userId: Option[Long] = None): DataFrame = {
    require(pairs.nonEmpty, "context search needs at least one context pair")
    val exIds = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val vecs = exampleVecs(exIds, "context")
    val base = userId.map(u => points.filter(col("user_id") === u)).getOrElse(points)
    base.filter(!col("id").isin(exIds.map(Long.box): _*))
      .withColumn("ctx_score", contextScore(pairs, vecs))
      .orderBy(col("ctx_score").desc, col("id").asc)
      .limit(k)
      .select(col("id"), col("text").as("string"), col("ctx_score"))
  }

  /** Batched search: each row of `queries(query_id, qvec, quser)` gets
    * its tenant-scoped top-k in one job — the set-oriented form of the
    * reference's per-request loop.
    */
  def searchBatch(queries: DataFrame, k: Int,
                  metric: (Column, Column) => Column = l2Distance): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("score").asc, col("id").asc)
    points.join(broadcast(queries), col("user_id") === col("quser"))
      .withColumn("score", metric(col("qvec"), col("vector")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("id"), col("text").as("string"), col("score"))
  }

  /** Tenant statistics (collection scroll/count surface). */
  def countByTenant(): DataFrame =
    points.groupBy("user_id").agg(count(lit(1)).as("n"))

  /** Grouped search — Qdrant's search_groups API: the top `nGroups`
    * values of `groupField` ranked by their best hit's distance to
    * `qvec`, with each group's `perGroup` best hits. The per-group cut
    * happens inside the distance scan's exchange (WindowGroupLimit), so
    * only perGroup×groups rows reach the tiny group-ranking step.
    */
  def searchGroups(qvec: Seq[Double], groupField: String = "site",
                   nGroups: Int = 3, perGroup: Int = 2,
                   userId: Option[Long] = None): DataFrame = {
    val base = userId.map(u => points.filter(col("user_id") === u)).getOrElse(points)
    val inGroup = Window.partitionBy(groupField).orderBy(col("score").asc, col("id").asc)
    val hits = base
      .withColumn("score", l2Distance(lit(qvec.toArray), col("vector")))
      .withColumn("hit_rank", row_number().over(inGroup).cast("long"))
      .filter(col("hit_rank") <= perGroup)
    // group selection: TakeOrdered cut to nGroups BEFORE ranking — the
    // per-group best rows are |groups|-many, and a global rank window
    // would sort them all in one task; the limit keeps per-partition
    // heaps + an nGroups-row merge, then the rank runs over nGroups rows
    val top = hits.filter(col("hit_rank") === 1)
      .select(col(groupField), col("score").as("best_score"))
      .orderBy(col("best_score").asc, col(groupField).asc).limit(nGroups)
      .withColumn("group_rank", row_number().over(Window.partitionBy(lit(0))
        .orderBy(col("best_score").asc, col(groupField).asc)).cast("long"))
    hits.join(broadcast(top.select(groupField, "group_rank")), groupField)
      .select(col("group_rank"), col(groupField), col("hit_rank"), col("id"),
        col("text").as("string"), col("score"))
      .orderBy("group_rank", "hit_rank")
  }

  /** Facet counts — Qdrant's facet API: distinct values of a payload
    * field with point counts, under an optional filter predicate.
    */
  def facet(field: String, filter: Column = lit(true)): DataFrame =
    points.filter(filter)
      .groupBy(col(field)).agg(count(lit(1)).as("n"))
      .orderBy(col(field))

  /** Keyset-paginated SCROLL — the reference pages the collection with
    * `client.scroll` to apply its word/regex deletes
    * (/root/reference/app.py:99-107): up to `n` points with
    * id > `afterId` in id order; the caller passes the last id back as
    * the next cursor. Plans as a pushed id-range scan +
    * TakeOrderedAndProject — page cost is O(page), not O(collection),
    * at any collection size (keyset, not OFFSET, pagination).
    */
  def scroll(afterId: Long = -1L, n: Int = 100): DataFrame =
    points.filter(col("id") > afterId).orderBy(col("id")).limit(n)

  /** Scroll ordered by a payload FIELD (Qdrant scroll `order_by`):
    * one page in (field, id) order resuming after a (fieldValue, id)
    * cursor. Same keyset shape as [[scroll]] — pushed residual filter +
    * TakeOrderedAndProject, O(page) anywhere in the collection.
    */
  def scrollBy(field: String, afterValue: String, afterId: Long,
               n: Int = 100): DataFrame =
    points.filter(col(field) > afterValue ||
        (col(field) === afterValue && col("id") > afterId))
      .orderBy(col(field), col("id")).limit(n)

  /** Score-THRESHOLD search (Qdrant's `score_threshold`): every point of
    * the tenant within distance τ of the query (or above τ for
    * similarity metrics via `ascending = false`), best-first. The cut
    * is a filter — result size is data-driven, no rank state.
    */
  def searchThreshold(qvec: Seq[Double], userId: Long, tau: Double,
                      metric: (Column, Column) => Column = l2Distance,
                      ascending: Boolean = true): DataFrame = {
    val scored = points.filter(col("user_id") === userId)
      .withColumn("score", metric(lit(qvec.toArray), col("vector")))
      .filter(if (ascending) col("score") <= tau else col("score") >= tau)
    scored.orderBy(if (ascending) col("score").asc else col("score").desc, col("id").asc)
      .select(col("id"), col("text").as("string"), col("score"))
  }

  /** Persist bucketed by tenant hash; tenant-scoped reads prune to one
    * bucket directory.
    */
  def save(path: String, nBuckets: Int = 64): Unit =
    points
      .withColumn("bucket", pmod(hash(col("user_id")), lit(nBuckets)))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(path)
}

object VectorIndex {

  val schema: Seq[String] = Seq("id", "vector", "text", "user_id", "site", "lang", "seq")

  def apply(points: DataFrame,
            embedder: Embedder = FeatureHashEmbedder): VectorIndex = {
    require(schema.forall(points.columns.contains),
      s"points must have columns $schema, got ${points.columns.toSeq}")
    // extra columns RIDE ALONG after the canonical seven — they are the
    // payload/named-vector surface (HasVector's "each name is its own
    // nullable ARRAY column") and the filter-object validation checks
    // fields against the visible schema, so silently projecting them
    // away would refuse conditions on real data
    val extras = points.columns.filterNot(schema.contains)
    new VectorIndex(points.select((schema ++ extras).map(col): _*), embedder)
  }

  /** Build a collection FROM RAW TEXTS — the /insert flow (app.py:36-54
    * embeds each text then upserts the point): embed every document
    * with `embedder` (default: the deterministic feature-hash model)
    * and assemble the point schema. `docs` needs (doc_id, text,
    * user_id, site, lang).
    *
    * `contentAddressed = true` keys points by xxhash64(text) instead
    * of doc_id — the reference test suite's uuid3-of-text ids
    * (/root/reference/test_qdrant.py): re-inserting the same text
    * OVERWRITES the existing point, so duplicate texts collapse to one
    * point at build time (last writer by doc_id order wins, exactly
    * the serving store's upsert outcome).
    */
  def fromTexts(docs: DataFrame, embedder: Embedder = FeatureHashEmbedder,
                contentAddressed: Boolean = false): VectorIndex = {
    val emb = embedder.embed(docs)
    val idCol = if (contentAddressed) xxhash64(col("text")) else col("doc_id")
    val pts = docs
      .join(emb, "doc_id")
      .select(idCol.as("id"), col("embedding").as("vector"), col("text"),
        col("user_id"), col("site"), col("lang"), col("doc_id").as("seq"))
    val resolved = if (contentAddressed) {
      val w = Window.partitionBy("id").orderBy(col("seq").desc)
      pts.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1).drop("__rk")
    } else pts
    VectorIndex(resolved, embedder)
  }

  /** Reopen a saved collection. Tenant-filtered queries prune buckets:
    * the reader keeps `bucket` as a partition column. If the path holds
    * rotated generations (streaming upsert maintenance), the newest
    * COMMITTED generation is read — see [[resolveSnapshot]]. The
    * embedder is MODEL state, not data — pass the one the collection
    * was built with (defaults to the feature-hash model).
    */
  def load(spark: SparkSession, path: String,
           embedder: Embedder = FeatureHashEmbedder): VectorIndex =
    // through apply: extra payload/named-vector columns (and the bucket
    // partition column) survive the round trip — a filter condition
    // that worked pre-save must keep working after reload
    VectorIndex(spark.read.parquet(resolveSnapshot(spark, path)), embedder)

  private val GenPrefix = "gen-"

  /** Generation directory name for a rotation id — zero-padded so
    * lexicographic order ≡ numeric order.
    */
  def generationDir(id: Long): String = f"$GenPrefix$id%012d"

  /** Resolve a snapshot root to its live data directory. A root written
    * by plain [[VectorIndex.save]] IS the data. A root maintained by
    * streaming rotation holds numbered `gen-N` subdirectories; the live
    * one is the newest with a `_SUCCESS` marker — the parquet job's own
    * single-file commit, atomic on HDFS and object stores alike. A crash
    * mid-write leaves an uncommitted (ignored) generation; readers never
    * observe a missing or half-rotated snapshot, unlike delete-then-
    * rename rotation.
    */
  /** One directory listing of a snapshot root: every `gen-N` name with
    * its committed flag, name-ascending (zero-padded ≡ numeric). The
    * single source for [[resolveSnapshot]], [[generations]], and
    * [[SnapshotGc]]'s plan.
    */
  private[api] def listGenerationDirs(spark: SparkSession,
                                      path: String): Seq[(String, Boolean)] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(GenPrefix))
      .map(st => st.getPath.getName ->
        fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .sortBy(_._1)
  }

  def resolveSnapshot(spark: SparkSession, path: String): String =
    listGenerationDirs(spark, path).filter(_._2).lastOption
      .map { case (g, _) => s"$path/$g" }.getOrElse(path)

  /** Every COMMITTED generation id under a snapshot root, ascending —
    * the time-travel axis ([[resolveSnapshotAt]] reads one of these;
    * what [[SnapshotGc]] has reclaimed no longer appears).
    */
  def generations(spark: SparkSession, path: String): Seq[Long] =
    listGenerationDirs(spark, path).collect {
      case (g, true) => g.stripPrefix(GenPrefix).toLong
    }

  /** The next free generation slot — allocated over ALL `gen-N` names,
    * committed OR not. Allocating over committed names only would hand
    * out a slot already occupied by a torn/in-flight generation (exactly
    * what [[SnapshotGc]]'s torn-retention window deliberately keeps
    * around): on HDFS `rename(tmp, dest)` with an existing dest moves
    * tmp INSIDE dest and reports success, silently burying the data in
    * an uncommitted dir, and an overwrite-mode write would clobber a
    * racing writer's in-flight generation.
    */
  private[api] def nextGeneration(spark: SparkSession, path: String): Long =
    listGenerationDirs(spark, path)
      .map(_._1.stripPrefix(GenPrefix).toLong)
      .maxOption.map(_ + 1).getOrElse(0L)

  /** TIME TRAVEL: the data directory of one SPECIFIC committed
    * generation — "query yesterday's index" for a rollback check or an
    * A/B diff against the live snapshot ([[graft.operators.VectorStore
    * .snapshotDiff]]'s input pair). Refuses uncommitted or reclaimed
    * generations rather than serving torn data.
    */
  def resolveSnapshotAt(spark: SparkSession, path: String, generation: Long): String = {
    val p = new org.apache.hadoop.fs.Path(s"$path/${generationDir(generation)}")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p) && fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")),
      s"generation $generation at $path is missing or uncommitted")
    p.toString
  }

  /** Load the index as of a specific committed generation. */
  def loadAt(spark: SparkSession, path: String, generation: Long,
             embedder: Embedder = FeatureHashEmbedder): VectorIndex =
    VectorIndex(spark.read.parquet(resolveSnapshotAt(spark, path, generation)),
      embedder)

  /** Nearest-centroid classification — /get_category_for_title: every
    * row of `items(item_id, vec)` is assigned the argmin-euclidean row
    * of `categories(cat, cvec)` (the reference embeds category names;
    * any embedded label set works).
    */
  def classify(items: DataFrame, categories: DataFrame): DataFrame = {
    val w = Window.partitionBy("item_id").orderBy(col("dist").asc, col("cat").asc)
    items.join(broadcast(categories))
      .withColumn("dist", l2Distance(col("vec"), col("cvec")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("item_id"), col("cat"), col("dist"))
  }

  /** Collection INFO — the `GET /collections/{name}` endpoint as data:
    * live point/tenant counts, vector dimensionality, physical layout
    * (bucket partitions, storage bytes of the LIVE generation only —
    * rotation history is [[SnapshotGc]]'s ledger, not the serving
    * footprint), and the generation axis. One metadata listing + one
    * aggregate over the live snapshot; nothing scans history.
    */
  case class CollectionInfo(points: Long, tenants: Long, dim: Int,
                            buckets: Int, liveBytes: Long,
                            generations: Seq[Long], liveGeneration: Option[Long])

  def info(spark: SparkSession, path: String): CollectionInfo = {
    val live = resolveSnapshot(spark, path)
    val p = new org.apache.hadoop.fs.Path(live)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gens = generations(spark, path)
    val bytes =
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    // a collection drained to zero rows (bare _SUCCESS generation — the
    // state ShardTransfer.pruneSource legitimately leaves) has no
    // readable schema; report the empty shape rather than throwing
    val dfOpt =
      try Some(spark.read.parquet(live))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    dfOpt match {
      case None =>
        CollectionInfo(0L, 0L, 0, 0, bytes, gens, gens.lastOption)
      case Some(df) =>
        val agg = df.agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("t"),
          coalesce(max(size(col("vector"))), lit(0)).as("d")).head()
        val buckets =
          if (df.columns.contains("bucket")) df.select("bucket").distinct().count().toInt
          else 0
        CollectionInfo(agg.getLong(0), agg.getLong(1), agg.getInt(2), buckets,
          bytes, gens, gens.lastOption)
    }
  }
}
