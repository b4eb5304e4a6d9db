package graft

import graft.api.MultiVecIndex
import graft.functions.Vectors._
import org.apache.spark.sql.functions._

/** The ColBERT-shape multivector serving artifact (VERDICT r11 #4):
  * candidate docs from per-query-token IVF probes, exact max_sim
  * rerank. Contract trio: (1) at full probes + unbounded tokenK the
  * route is EXACT (candidate set = all docs → the rerank IS the brute
  * operator's math); (2) at production knobs recall holds a floor on a
  * clustered corpus (the geometry IVF is built for); (3) vectors never
  * cross a shuffle exchange in the serving plan.
  */
class MultiVecIndexSpec extends SparkSpecBase {

  private def tmp(n: String) =
    java.nio.file.Files.createTempDirectory(s"mvidx-$n").toString + "/idx"

  // 48 docs x 4 tokens in 8 clusters: doc d's tokens sit around
  // cluster (d % 8)'s center with small deterministic jitter — the
  // clustered corpus the recall floor is stated on
  private lazy val clustered = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc BIGINT, vec_id BIGINT, vec ARRAY<DOUBLE>")
    val rows = for {
      d <- 0L until 48L
      t <- 0L until 4L
    } yield {
      val c = (d % 8).toDouble
      val jitter = ((d * 31 + t * 7) % 13).toDouble / 100.0
      org.apache.spark.sql.Row(d, d * 4 + t,
        Seq(math.cos(c) + jitter, math.sin(c) - jitter,
          c / 8.0 + jitter * 0.5, 1.0 - jitter))
    }
    spark.createDataFrame(rows.asJava, schema)
  }

  /** Brute max_sim over the token relation — the truth the artifact
    * route is scored against (the `vs_multivec_maxsim` math).
    */
  private def brute(queryDoc: Long, k: Int) = {
    val q = clustered.filter(col("doc") === queryDoc)
      .select(col("vec_id").as("qt"), col("vec").as("qvec"))
    clustered.filter(col("doc") =!= queryDoc)
      .join(broadcast(q))
      .withColumn("cos", cosineSim(col("qvec"), col("vec")))
      .groupBy("doc", "qt").agg(max("cos").as("mx"))
      .withColumn("mx6", round(col("mx"), 6).cast("decimal(18,6)"))
      .groupBy("doc").agg(sum("mx6").as("sc"))
      .orderBy(col("sc").desc, col("doc"))
      .limit(k)
      .select(col("doc"), col("sc").cast("double").as("maxsim"))
  }

  test("full probes + unbounded tokenK = the exact brute max_sim, bit-for-bit") {
    val idx = MultiVecIndex.build(clustered, tmp("exact"), nlist = 4)
    val got = idx.search(idx.tokensOf(0L), k = 10, nprobe = 4,
        tokenK = 200, excludeDoc = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val expect = brute(0L, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expect && got.nonEmpty)
  }

  test("a reopened token layout serves identically (load round-trip)") {
    val path = tmp("load")
    val built = MultiVecIndex.build(clustered, path, nlist = 4)
    val loaded = MultiVecIndex.load(spark, path)
    val q = built.tokensOf(7L)
    assert(loaded.search(q, k = 5, nprobe = 2, tokenK = 16,
        excludeDoc = Some(7L)).collect().toSeq ===
      built.search(q, k = 5, nprobe = 2, tokenK = 16,
        excludeDoc = Some(7L)).collect().toSeq)
    assert(loaded.tokensOf(7L) === q)
    // a token relation missing the doc column refuses at build
    intercept[IllegalArgumentException](MultiVecIndex.build(
      clustered.drop("doc"), tmp("bad")))
  }

  test("production knobs hold a recall floor on the clustered corpus") {
    val idx = MultiVecIndex.build(clustered, tmp("recall"), nlist = 8)
    val truth = brute(5L, 5).collect().map(_.getLong(0)).toSet
    val got = idx.search(idx.tokensOf(5L), k = 5, nprobe = 2, tokenK = 16,
        excludeDoc = Some(5L))
      .collect().map(_.getLong(0)).toSet
    val recall = (got & truth).size.toDouble / truth.size
    assert(recall >= 0.8, s"multivector recall@5 too low: $recall " +
      s"(got $got vs $truth)")
  }

  test("vectors never cross a shuffle exchange; probes prune the token scan") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.ArrayType
    val idx = MultiVecIndex.build(clustered, tmp("plan"), nlist = 4)
    val df = idx.search(idx.tokensOf(3L), k = 5, nprobe = 2, tokenK = 8,
      excludeDoc = Some(3L))
    df.collect() // AQE finalizes the plan
    val sp = df.queryExecution.executedPlan
    val offenders = sp.collect {
      case e: ShuffleExchangeExec
        if e.child.output.exists(_.dataType.isInstanceOf[ArrayType]) => e
    }
    assert(offenders.isEmpty, s"token vectors crossed an exchange:\n$sp")
    // the stage-1 scan is partition-pruned to the probed lists
    val plan = sp.toString
    assert(plan.contains("PartitionFilters") && plan.contains("list#"), plan)
    // guards
    intercept[IllegalArgumentException](idx.search(Nil, 5))
    intercept[IllegalArgumentException](idx.tokensOf(999999L))
  }

  test("deleteTo: doc delete rotates the token layout and never serves the deleted docs") {
    val root = java.nio.file.Files.createTempDirectory("mvidx-del").toString
    val idx = MultiVecIndex.build(clustered, s"$root/idx", nlist = 4)
    val doomed = Seq(1L, 9L, 17L) // one cluster's look-alikes of doc 1
    val rotated = idx.deleteTo(s"$root/rotated", doomed)
    // every token row of the doomed docs is gone; all others survive
    val docsLeft = rotated.ann.points.select("doc").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(docsLeft === (0L until 48L).toSet -- doomed)
    assert(rotated.ann.points.count() === (48 - doomed.size) * 4L)
    // the quantizer carried over, so at EXACT settings the rotation
    // serves precisely the brute ranking with the doomed docs excluded
    val q = idx.tokensOf(0L)
    val got = rotated.search(q, k = 10, nprobe = 4, tokenK = 200,
        excludeDoc = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val expect = brute(0L, 13)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .filterNot(r => doomed.contains(r._1)).take(10).toSeq
    assert(got === expect && got.nonEmpty)
    assert(got.forall(r => !doomed.contains(r._1)))
    // a deleted doc's tokens are unreachable through the rotation
    intercept[IllegalArgumentException](rotated.tokensOf(1L))
    // guards ride the AnnIndex rotation: empty doc list, occupied dest
    intercept[IllegalArgumentException](rotated.deleteTo(s"$root/x", Nil))
    intercept[IllegalArgumentException](idx.deleteTo(s"$root/rotated", Seq(2L)))
  }

  test("the indexed operator row serves the memoized artifact and ranks sanely") {
    val got = SparkEntry.queries("vs_multivec_maxsim_indexed")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.nonEmpty && got.length <= 10)
    assert(got.map(_._2).toSeq === got.map(_._2).sortBy(-_).toSeq,
      "maxsim scores must be non-increasing")
    assert(!got.map(_._1).contains(0L), "query doc must be excluded")
    // every served doc's score equals the brute operator's score for
    // that doc (stage 2 is the exact math on the candidate set)
    val bruteScores = operators.VectorStore.multivecMaxSim(spark, sf, 0, k = 1000000)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    got.foreach { case (doc, sc) =>
      assert(math.abs(bruteScores(doc) - sc) < 1e-12,
        s"doc $doc rerank score drifted from the brute math") }
  }
}
