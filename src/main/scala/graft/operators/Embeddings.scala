package graft.operators

import graft.Tables
import graft.functions.Vectors._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-column maintenance operators for a vector store: centroid
  * builds (the coarse-quantizer / class-prototype primitive) and scalar
  * quantization (the int8 compression Qdrant-class engines apply before
  * ANN; reference collections store full float vectors —
  * /root/reference/insert.py:60-75 — and SQ is the standard scale path).
  *
  * Both are explode-shaped: vectors become (id, dim, value) triples so
  * every aggregate is a plain partial-agg'd groupBy — no per-row lambda,
  * no driver collection, any dimension count. At 100 TB the shuffle
  * carries only (group, dim, partial) rows: nlabels×dim for centroids,
  * dim for quantizer bounds.
  */
object Embeddings {

  /** Per-label mean vector as (label, dim, mean, n) rows — the batch
    * centroid/prototype build. Mean is computed as an exact DECIMAL sum
    * over float32 inputs (each float widens exactly to DECIMAL(18,10))
    * divided by the count — partial-aggregation order cannot move the
    * result, so it hash-matches the oracle bit-for-bit.
    */
  def labelCentroids(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("label", "dim")
      .agg((sum(col("v").cast("decimal(18,10)")).cast("double") / count(lit(1))).as("mean_raw"),
        count(lit(1)).as("n"))
      .select(col("label"), col("dim").cast("long").as("dim"),
        round(col("mean_raw"), 6).as("mean"), col("n"))
      .orderBy("label", "dim")

  /** Scalar quantization to int8: per-dimension global [min, max] over
    * the corpus, code = floor((v − min)/(max − min)·256) clamped to
    * [0, 255]. floor (not round) keeps the engine-independent double
    * expression unambiguous at bucket boundaries. Output is integer
    * codes — exactly comparable. The bounds table is dim-sized (tiny) and
    * broadcast back; the corpus is touched in two map passes + one
    * dim-keyed partial agg.
    */
  def quantizeSq(s: SparkSession, d: String): DataFrame = {
    val vals = Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("dim"), col("v").cast("double").as("v"))
    val bounds = vals.groupBy("dim")
      .agg(min("v").as("lo"), max("v").as("hi"))
    vals.join(broadcast(bounds), "dim")
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        when(col("hi") === col("lo"), lit(0L)) // constant dimension → single code
          .otherwise(least(floor((col("v") - col("lo")) / (col("hi") - col("lo")) * 256),
            lit(255.0)).cast("long")).as("code"))
      .orderBy("vec_id", "dim")
  }
}
