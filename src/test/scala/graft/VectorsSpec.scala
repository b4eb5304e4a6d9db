package graft

import graft.functions.Vectors._
import org.apache.spark.sql.functions._

class VectorsSpec extends SparkSpecBase {
  import spark.implicits._

  test("dot / l2 / cosine match hand-computed values") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val r = df.select(
      dot(col("a"), col("b")).as("d"),
      l2Distance(col("a"), col("b")).as("l2"),
      cosineSim(col("a"), col("b")).as("cs"),
      l2Norm(col("a")).as("n")).head()
    assert(r.getDouble(0) === 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(27.0)) < 1e-12)
    val expCs = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(r.getDouble(2) - expCs) < 1e-12)
    assert(math.abs(r.getDouble(3) - math.sqrt(14.0)) < 1e-12)
  }

  test("normalize yields unit vectors") {
    val df = Seq(Tuple1(Seq(3.0, 4.0))).toDF("a")
    val n = df.select(l2Norm(normalize(col("a"))).as("n")).head().getDouble(0)
    assert(math.abs(n - 1.0) < 1e-12)
  }

  test("toDouble casts float arrays") {
    val emb = Tables.embeddings(spark, sf).select(toDouble(col("embedding")).as("v"))
    val d = emb.select(l2Norm(col("v")).as("n")).head().getDouble(0)
    assert(math.abs(d - 1.0) < 1e-3) // embeddings are ~unit-normalized
  }
}
