package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math as Column-level compositions of built-in higher-order
  * functions (`zip_with` + `aggregate`), which Catalyst code-generates —
  * no UDF/boxing on the hot path, and the whole distance computation
  * stays inside a WholeStageCodegen span.
  *
  * Semantics mirror /root/reference (Qdrant `Distance.EUCLID` in
  * insert.py:72, cosine as the standard alternative; nearest-centroid
  * argmin over euclidean in app.py:142-168).
  *
  * All helpers assume `ARRAY<DOUBLE>` inputs (cast float arrays once at
  * load — see graft.Tables.points) and sum in index order, which matches
  * DuckDB's list_* fold order so oracle comparisons are stable.
  */
object Vectors {

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Euclidean distance — the reference collection's metric. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity (dot / (‖a‖·‖b‖)). */
  def cosineSim(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** a / ‖a‖ — unit-normalize, so cosine reduces to dot at query time.
    * Precomputing this on the corpus once removes the norm from every
    * query-point distance evaluation (O(d) per pair saved at 100 TB).
    */
  def normalize(a: Column): Column = {
    val n = l2Norm(a)
    transform(a, x => x / n)
  }

  /** Cast an ARRAY<FLOAT> column to ARRAY<DOUBLE>. */
  def toDouble(a: Column): Column = transform(a, _.cast("double"))
}
