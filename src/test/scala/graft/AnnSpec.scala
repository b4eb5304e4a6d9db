package graft

import graft.operators.Ann

class AnnSpec extends SparkSpecBase {

  private def topkSets(rows: Array[org.apache.spark.sql.Row]): Map[Long, Set[Long]] =
    rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).toSet).toMap

  lazy val brute: Map[Long, Set[Long]] = topkSets(Ann.bruteTopK(spark, sf).collect())

  test("bruteTopK returns 10 per query, ranked by descending cosine") {
    val rows = Ann.bruteTopK(spark, sf).collect()
    assert(rows.length === 100) // 10 queries × k=10
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val cs = rs.sortBy(_.getLong(1)).map(_.getDouble(3)).toSeq
      assert(cs === cs.sorted.reverse)
    }
  }

  // The synthetic embeddings are near-orthogonal — ANN's worst case:
  // expected recall ≈ probed fraction (nprobe/nlist; bucket mass). The
  // bounds below assert the structures probe what they claim to probe;
  // clustered corpora at the same settings score far higher.

  test("IVF recall@10 >= 0.6 vs brute force (nprobe=8/16)") {
    val ivf = topkSets(Ann.ivfTopK(spark, sf).collect())
    val recall = brute.keys.toSeq.map { q =>
      (ivf.getOrElse(q, Set.empty) & brute(q)).size.toDouble / brute(q).size
    }.sum / brute.size
    assert(recall >= 0.6, s"IVF recall $recall")
  }

  test("IVF recall grows monotonically with nprobe and reaches 1.0 at full probe") {
    val recalls = Seq(2, 4, 8, 16).map { np =>
      val ivf = topkSets(Ann.ivfTopK(spark, sf, nprobe = np).collect())
      brute.keys.toSeq.map { q =>
        (ivf.getOrElse(q, Set.empty) & brute(q)).size.toDouble / brute(q).size
      }.sum / brute.size
    }
    // the knob must actually trade probe fraction for recall
    recalls.sliding(2).foreach(p => assert(p(0) <= p(1) + 1e-9, s"recall curve $recalls"))
    assert(math.abs(recalls.last - 1.0) < 1e-9, s"full probe must be exact: $recalls")
  }

  test("LSH multiprobe recall@10 >= 0.2 vs brute (4 bits, hamming-1 = 5/16 mass)") {
    val lsh = topkSets(Ann.lshTopK(spark, sf).collect())
    val recall = brute.keys.toSeq.map { q =>
      (lsh.getOrElse(q, Set.empty) & brute(q)).size.toDouble / brute(q).size
    }.sum / brute.size
    assert(recall >= 0.2, s"LSH recall $recall")
  }

  test("LSH emits at most k ranked rows per query with descending scores") {
    val rows = Ann.lshTopK(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 10)
      val cs = rs.sortBy(_.getLong(1)).map(_.getDouble(3)).toSeq
      assert(cs === cs.sorted.reverse)
    }
  }

  test("nn-descent knn graph: k-regular, self-free, recall improves over init") {
    import org.apache.spark.sql.functions._
    val k = 5
    // ground truth: brute-force k-nn graph over the embedding corpus
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), graft.functions.Vectors.toDouble(col("embedding")).as("vec"))
    val n = emb.count().toInt
    val brute = emb.as("a").join(emb.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"),
        graft.functions.Vectors.cosineSim(col("a.vec"), col("b.vec")).as("cs"))
      .withColumn("rk", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("src").orderBy(col("cs").desc, col("dst").asc)))
      .filter(col("rk") <= k).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val g = df.collect().groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(2)).toSet).toMap
      brute.keys.toSeq.map { v =>
        (g.getOrElse(v, Set.empty) & brute(v)).size.toDouble / brute(v).size
      }.sum / brute.size
    }
    val refined = Ann.nnDescentGraph(spark, sf, k = k, rounds = 2)
    val rows = refined.collect()
    // shape: <= k neighbors each, no self loops, scores descending per node
    rows.foreach(r => assert(r.getLong(0) != r.getLong(2)))
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= k)
      val cs = rs.sortBy(_.getLong(1)).map(_.getDouble(3)).toSeq
      assert(cs === cs.sorted.reverse)
    }
    assert(rows.groupBy(_.getLong(0)).size === n) // every vector has a list
    val r0 = recall(Ann.nnDescentGraph(spark, sf, k = k, rounds = 0))
    val r2 = recall(refined)
    assert(r2 >= r0 - 1e-9, s"descent hurt recall: $r2 < $r0")
    assert(r2 >= 0.5, s"nn-descent recall@$k $r2 (init $r0)")
  }
}
