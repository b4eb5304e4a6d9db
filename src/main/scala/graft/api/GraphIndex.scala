package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Persistent GRAPH-ANN index — the batch analogue of the HNSW index
  * Qdrant serves the reference's searches from
  * (/root/reference/search.py:31-49): build the NN-descent k-NN graph
  * ONCE over a corpus snapshot, persist it as plain parquet relations,
  * and serve any number of beam searches from the loaded artifact.
  * Complements [[AnnIndex]] (flat IVF partition-pruned probing) with
  * the recall-at-candidate-budget tier graph traversal buys on
  * clustered corpora.
  *
  * Layout under `path`:
  *   - `vectors/` — (vec_id, vec [, payload…]); extra columns ride
  *     along and are filterable at search time
  *   - `edges/`   — UNDIRECTED (src, dst) k-NN edge list
  *   - `entries/` — the hash-sampled entry node ids (fixed at build
  *     time, so a reopened index routes identically)
  *
  * Scale shape: searches never shuffle the corpus — candidates and
  * frontiers broadcast into the vectors/edges scans (see
  * `Ann.beamSearch`); the graph build is the linear-init NN-descent
  * pipeline. Everything is deterministic (seeded k-means, xxhash
  * ordering, integer tie-breaks), so build → save → load → search
  * reproduces bit-for-bit.
  */
class GraphIndex private (spark: SparkSession, path: String) {

  private val vectors = spark.read.parquet(s"$path/vectors").cache()
  private val edges = spark.read.parquet(s"$path/edges").cache()
  private val entries = spark.read.parquet(s"$path/entries")

  /** Top-k beam search for one query vector. `filter` is a payload
    * predicate applied to the RESULT set (post-filter — traversal
    * routes through non-matching nodes, so raise `beam`/`hops` when
    * the filter is selective and k results must survive it).
    */
  def search(qvec: Seq[Double], k: Int = 10, beam: Int = 10, hops: Int = 2,
             filter: Option[Column] = None): DataFrame = {
    import spark.implicits._
    val queries = Seq(0L).toDF("query_id")
      .withColumn("qvec", array(qvec.map(lit): _*))
    val scored = searchBatch(queries, k, beam, hops, filter,
      oversample = filter.isDefined)
    scored.drop("query_id")
  }

  /** Batched top-k beam search: `queries` needs (query_id, qvec). */
  def searchBatch(queries: DataFrame, k: Int = 10, beam: Int = 10,
                  hops: Int = 2, filter: Option[Column] = None,
                  oversample: Boolean = false): DataFrame = {
    val emb = vectors.select(col("vec_id"), col("vec"))
    // with a post-filter, rank over a larger scored pool so k
    // survivors remain after the predicate cut
    val kk = if (oversample) math.max(k * 4, beam) else k
    val (ranked, _) = Ann.beamSearch(emb, edges, entries, queries, kk, beam, hops)
    val filtered = filter match {
      case Some(p) =>
        // re-attach payload for the predicate, then re-rank within query
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id").asc)
        ranked.join(vectors.drop("vec"), "vec_id").filter(p)
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= k)
          .select(col("query_id"), col("rank"), col("vec_id"), col("cosine"))
      case None => ranked
    }
    filtered.orderBy("query_id", "rank")
  }
}

object GraphIndex {

  /** Build and persist: NN-descent k-NN graph (linear ring-sampled
    * init) + hash-sampled entry set + the vector relation itself.
    * `corpus` needs (vec_id BIGINT, vec ARRAY<DOUBLE>); extra columns
    * persist as payload.
    */
  def build(corpus: DataFrame, path: String, graphK: Int = 10,
            rounds: Int = 2, entries: Int = 32, iters: Int = 3): GraphIndex = {
    val spark = corpus.sparkSession
    val emb = corpus.select(col("vec_id"), col("vec")).cache()
    val lists = math.max(16, math.ceil(math.sqrt(emb.count().toDouble)).toInt)
    val cents = Ann.kmeansCentroids(emb, lists, iters)
    val g = Ann.descendEdges(emb, cents, graphK, rounds, cap = 4 * graphK)
      .select("src", "dst")
    g.union(g.select(col("dst").as("src"), col("src").as("dst"))).distinct()
      .write.mode("overwrite").parquet(s"$path/edges")
    Ann.entrySample(emb, entries)
      .write.mode("overwrite").parquet(s"$path/entries")
    corpus.write.mode("overwrite").parquet(s"$path/vectors")
    new GraphIndex(spark, path)
  }

  /** Reopen a persisted index. */
  def load(spark: SparkSession, path: String): GraphIndex =
    new GraphIndex(spark, path)
}
