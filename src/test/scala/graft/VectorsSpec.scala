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

  test("l1 (Manhattan — Qdrant's fourth metric): codegen ≡ interpreted ≡ hand math, NULL-safe") {
    val df = Seq((Seq(1.0, 2.0, 3.5), Seq(4.0, 0.5, 3.0))).toDF("a", "b")
    assert(df.select(l1Distance(col("a"), col("b"))).head().getDouble(0) === 5.0)
    // interpreted path agrees with codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val expr = org.apache.spark.sql.graft.L1Distance(
      Literal.create(Seq(1.0, 2.0, 3.5), ArrayType(DoubleType)),
      Literal.create(Seq(4.0, 0.5, 3.0), ArrayType(DoubleType)))
    assert(expr.eval(null).asInstanceOf[Double] === 5.0)
    // NULL input → NULL out (no crash), matching the other kernels
    val withNull = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
    assert(withNull.select(l1Distance(col("a"), col("b"))).head().isNullAt(0))
    // the SQL surface rides the same expression
    assert(spark.sql(
      "SELECT graft_l1(array(1.0d, 2.0d, 3.5d), array(4.0d, 0.5d, 3.0d))")
      .head().getDouble(0) === 5.0)
  }

  test("normalize yields unit vectors") {
    val df = Seq(Tuple1(Seq(3.0, 4.0))).toDF("a")
    val r = df.select(normalize(col("a")).as("u")).head().getSeq[Double](0)
    assert(r === Seq(0.6, 0.8))
    val n = df.select(l2Norm(normalize(col("a"))).as("n")).head().getDouble(0)
    assert(math.abs(n - 1.0) < 1e-12)
    // interpreted path (nullSafeEval) agrees with codegen
    val expr = org.apache.spark.sql.graft.Normalize(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(3.0, 4.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
    val out = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
    assert(out.toSeq === Seq(0.6, 0.8))
  }

  test("jaccardSorted merge walk matches set arithmetic, codegen and interpreted") {
    val cases = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(3L, 4L, 5L, 6L), 2.0 / 6.0),
      (Seq(1L, 2L), Seq(1L, 2L), 1.0),
      (Seq(1L, 2L), Seq(3L, 4L), 0.0),
      (Seq.empty[Long], Seq(1L), 0.0))
    val df = cases.toDF("a", "b", "expected")
    // codegen path (projection)
    df.select(jaccardSorted(col("a"), col("b")).as("j"), col("expected"))
      .collect().foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
    // interpreted path (eval via filter on the driver-collected rows is
    // still codegen; force interpreted through a random-split-free
    // fallback: evaluate on literal expressions)
    cases.foreach { case (a, b, exp) =>
      val got = org.apache.spark.sql.graft.JaccardSorted(
        org.apache.spark.sql.catalyst.expressions.Literal.create(a,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(b,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
        .eval(null)
      assert(math.abs(got.asInstanceOf[Double] - exp) < 1e-12)
    }
  }

  test("packed sign bitmap: HammingPacked(SignPack) ≡ HammingSign on floats") {
    // handcrafted edges: dim not a multiple of 64, all-negative, zeros
    // (+0.0 and -0.0 are both >= 0 in double compare — both paths agree)
    val edges = Seq(
      (Seq.fill(70)(-1.0), Seq.tabulate(70)(i => if (i % 3 == 0) 1.0 else -1.0)),
      (Seq(0.0, -0.0, 1.0, -1.0), Seq(-1.0, 1.0, 1.0, -1.0)),
      (Seq.fill(64)(1.0), Seq.fill(64)(-1.0)),
      (Seq.empty[Double], Seq.empty[Double]))
    val df = edges.toDF("a", "b")
      .select(
        hammingSign(col("a"), col("b")).as("hs"),
        hammingPacked(signPack(col("a")), signPack(col("b"))).as("hp"))
    df.collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // corpus-wide: every vector vs one query, both paths identical
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val qv = emb.filter(col("vec_id") === 0).head().getSeq[Double](1)
    val q = array(qv.map(lit): _*)
    val diff = emb
      .select(hammingSign(col("v"), q).as("hs"),
        hammingPacked(signPack(col("v")), signPack(q)).as("hp"))
      .filter(col("hs") =!= col("hp")).count()
    assert(diff === 0L)
    // the packed artifact really is ⌈dim/64⌉ words
    val dim = qv.length
    val words = emb.select(size(signPack(col("v"))).as("w")).distinct().collect()
    assert(words.map(_.getInt(0)).toSeq === Seq((dim + 63) / 64))
  }

  test("graft_jaccard is registered as a SQL function via extensions") {
    // the shared test session doesn't load GraftExtensions; apply directly
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("graft_jaccard"))) {
      // mimic injectFunction registration
      reg.createOrReplaceTempFunction("graft_jaccard",
        (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          org.apache.spark.sql.graft.JaccardSorted(args(0), args(1)), "scala_udf")
    }
    val j = spark.sql(
      "SELECT graft_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j").head().getDouble(0)
    assert(math.abs(j - 0.5) < 1e-12)
  }

  test("toDouble casts float arrays") {
    val emb = Tables.embeddings(spark, sf).select(toDouble(col("embedding")).as("v"))
    val d = emb.select(l2Norm(col("v")).as("n")).head().getDouble(0)
    assert(math.abs(d - 1.0) < 1e-3) // embeddings are ~unit-normalized
  }
}
