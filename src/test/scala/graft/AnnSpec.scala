package graft

import graft.operators.Ann

class AnnSpec extends SparkSpecBase {

  test("ivfResiduals accounts every vector against its assigned centroid") {
    val rows = graft.operators.Ann.ivfResiduals(spark, sf).collect()
    val balance = graft.operators.Ann.ivfBalance(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same assignment as the balance audit (same memoized quantizer)
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap === balance)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-6)
    // report is sorted by the signal: worst-represented list first
    val res = rows.map(_.getDouble(2)).toSeq
    assert(res === res.sorted.reverse)
  }

  test("ivfProbeTuning recall is monotone in nprobe and exactly 1.0 at nprobe=nlist") {
    val rows = graft.operators.Ann.ivfProbeTuning(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L, 8L, 16L))
    val recalls = rows.map(_.getDouble(2)).toSeq
    recalls.sliding(2).foreach(p => assert(p(0) <= p(1) + 1e-9, s"non-monotone: $recalls"))
    // scanning every list IS brute force: the endpoint anchors at 1.0
    assert(recalls.last === 1.0)
    assert(rows.last.getDouble(3) === 1.0)
    assert(rows.map(_.getLong(1)).distinct.length === 1) // same query set throughout
  }

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

  test("ring-sampled init stays linear per bucket (no |bucket|² blowup on a skewed bucket)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // worst case: ONE bucket holding all 200 nodes — the full cross
    // join would emit 200·199 pairs; the ring cap must stay at 2·cap
    // out-edges per node (cap forward + ≤ cap reverse)
    val cap = 5
    val posts = (0L until 200L).map(v => (v, 0L)).toDF("vec_id", "cid")
    val pairs = Ann.ringInitPairs(posts, cap).cache()
    val total = pairs.count()
    assert(total <= 200L * 2 * cap, s"init pairs $total exceed the linear bound")
    val maxDeg = pairs.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(maxDeg <= 2L * cap, s"node degree $maxDeg exceeds 2·cap")
    // no self pairs, and the sample is symmetric (reverse edges present)
    assert(pairs.filter(col("src") === col("dst")).count() === 0)
    val rev = pairs.select(col("dst").as("src"), col("src").as("dst"))
    assert(pairs.except(rev).count() === 0, "init sample not symmetric")
    // a small bucket (≤ cap+1 members) still degenerates to ALL pairs
    val small = (0L until 4L).map(v => (v, 0L)).toDF("vec_id", "cid")
    assert(Ann.ringInitPairs(small, cap).count() === 4L * 3)
    pairs.unpersist()
  }

  test("graph-ANN beam search: k ranked rows, sub-scan budget, recall floor (worst case)") {
    val (res, budgetF) = Ann.graphTopKWithBudget(spark, sf)
    val budget = budgetF()
    val rows = res.collect()
    // shape: exactly k=10 ranked rows per query, scores descending
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length === 10)
      val cs = rs.sortBy(_.getLong(1)).map(_.getDouble(3)).toSeq
      assert(cs === cs.sorted.reverse)
    }
    // the traversal must be a genuine sub-scan: average per-query
    // candidates scored stay under IVF's default probe fraction (8/16)
    val n = Tables.embeddings(spark, sf).count() - 10
    assert(budget <= 0.55 * n, s"graph scored $budget of $n per query")
    val gr = brute.keys.toSeq.map { q =>
      (topkSets(rows).getOrElse(q, Set.empty) & brute(q)).size.toDouble / brute(q).size
    }.sum / brute.size
    // near-orthogonal embeddings are graph search's worst case (no
    // gradient to climb — recall ≈ scored fraction); clustered-corpus
    // superiority over IVF is the next test
    assert(gr >= 0.5, s"graph recall $gr at budget $budget/$n")
  }

  test("graph-ANN beats-or-matches IVF on a clustered corpus at a smaller candidate budget") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the regime graph indexes exist for: well-clustered embeddings.
    // 8 gaussian clusters × 80 members; queries = fresh perturbations
    // of 8 distinct cluster centers (+2 re-used) with vec_id < 10.
    // Corpus ids are handed out round-robin across clusters so NO id
    // range is cluster-correlated (the entry sample must not get a
    // free ride from the layout).
    val rnd = new scala.util.Random(42)
    val dim = 64; val nClusters = 8; val per = 80
    val centers = Array.fill(nClusters, dim)(rnd.nextGaussian())
    def jitter(c: Array[Double]): Seq[Float] =
      c.map(v => (v + 0.25 * rnd.nextGaussian()).toFloat).toSeq
    val members = for (i <- 0 until per; c <- 0 until nClusters)
      yield (10L + i * nClusters + c, jitter(centers(c)), c)
    val queries = (0 until 10).map(q => (q.toLong, jitter(centers(q % nClusters)), q % nClusters))
    val dir = java.nio.file.Files.createTempDirectory("graft_clustered").toString
    (queries ++ members).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val cbrute = topkSets(Ann.bruteTopK(spark, dir).collect())
    def recallOf(m: Map[Long, Set[Long]]): Double =
      cbrute.keys.toSeq.map { q =>
        (m.getOrElse(q, Set.empty) & cbrute(q)).size.toDouble / cbrute(q).size
      }.sum / cbrute.size
    val (res, budgetF) = Ann.graphTopKWithBudget(spark, dir)
    val budget = budgetF()
    val gr = recallOf(topkSets(res.collect()))
    val ivfR = recallOf(topkSets(Ann.ivfTopK(spark, dir).collect()))
    val n = nClusters * per
    // IVF's default probe budget is half the corpus; the traversal must
    // match its recall while scoring strictly less
    assert(budget < 0.5 * n, s"graph budget $budget not below IVF's ${0.5 * n}")
    assert(gr >= ivfR - 1e-9, s"graph recall $gr < IVF $ivfR (budget $budget/$n)")
    assert(gr >= 0.9, s"graph recall $gr on clustered corpus (budget $budget/$n)")
  }

  test("centroid-routed entries >= equal-size hash sample on a many-cluster corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // MORE coarse regions than a flat sample covers: 48 clusters × 24
    // members. A 48-node hash sample hits ~1-1/e of the clusters; a
    // query whose cluster drew no entry cannot tunnel in (the k-NN
    // graph of well-separated clusters has ~no inter-cluster edges).
    // Centroid routing guarantees one door per cluster at the SAME
    // entry-set size — recall must dominate at comparable budget.
    val rnd = new scala.util.Random(7)
    val dim = 32; val nClusters = 48; val per = 24
    val centers = Array.fill(nClusters, dim)(rnd.nextGaussian())
    def jitter(c: Array[Double]): Seq[Double] =
      c.map(v => v + 0.25 * rnd.nextGaussian()).toSeq
    // round-robin ids — no id range is cluster-correlated
    val members = for (i <- 0 until per; c <- 0 until nClusters)
      yield (10L + i * nClusters + c, jitter(centers(c)))
    val emb = members.toDF("vec_id", "vec").cache()
    val queries = (0 until 10).map(q => (q.toLong, jitter(centers(q * 4))))
      .toDF("query_id", "qvec").cache()
    val cents = Ann.kmeansCentroids(emb, nClusters, 3)
    val g0 = Ann.descendEdges(emb, cents, 10, rounds = 1, cap = 40).select("src", "dst")
    val edges = g0.union(g0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    val truth = topkSets(
      emb.join(broadcast(queries))
        .select(col("query_id"), lit(0L).as("rank"), col("vec_id"),
          graft.functions.Vectors.cosineSim(col("vec"), col("qvec")).as("cs"))
        .withColumn("rk", row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(col("cs").desc, col("vec_id").asc)))
        .filter(col("rk") <= 10).collect())
    def recallOf(m: Map[Long, Set[Long]]): Double =
      truth.keys.toSeq.map { q =>
        (m.getOrElse(q, Set.empty) & truth(q)).size.toDouble / truth(q).size
      }.sum / truth.size
    val nE = nClusters // equal entry-set size both ways
    val (hashRes, hashB) = Ann.beamSearch(emb, edges,
      Ann.entrySample(emb, nE), queries, 10, 10, 2)
    val (centRes, centB) = Ann.beamSearch(emb, edges,
      Ann.centroidEntries(emb, cents, nE), queries, 10, 10, 2)
    val (hr, cr) = (recallOf(topkSets(hashRes.collect())), recallOf(topkSets(centRes.collect())))
    val (hb, cb) = (hashB(), centB())
    assert(cb <= hb * 1.3 + nE, s"centroid budget $cb vs hash $hb not comparable")
    assert(cr >= hr - 1e-9, s"centroid recall $cr < hash-sample recall $hr")
    assert(cr >= 0.9, s"centroid-routed recall $cr (hash $hr, budgets $cb/$hb)")
  }

  test("recall eval ranks EVERY serving tier: brute 1.0, per-tier floors") {
    val rows = Ann.recallEval(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("bq", "brute", "graph", "ivf", "ivfpq", "lsh", "mrl", "pq", "sq"))
    val m = rows.map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(m("brute") === 1.0) // the harness's own ground-truth identity
    m.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
    assert(m("ivf") >= 0.6) // same floor the direct IVF spec holds
    // quantized-tier floors, slightly under the direct per-tier specs
    // (those average different query sets): every tier reranks exactly
    // after its coarse cut, so recall tracks the cut's survivor quality
    assert(m("sq") >= 0.7, s"sq ${m("sq")}")
    assert(m("bq") >= 0.4, s"bq ${m("bq")}")
    assert(m("mrl") >= 0.25, s"mrl ${m("mrl")}")
    assert(m("pq") >= 0.4, s"pq ${m("pq")}")
    assert(m("ivfpq") >= 0.3, s"ivfpq ${m("ivfpq")}")
    // batch methods count all 10 queries; quantized tiers their 5-id sample
    val nq = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("brute", "graph", "ivf", "lsh").foreach(t => assert(nq(t) === 10L))
    Seq("sq", "bq", "mrl", "pq", "ivfpq").foreach(t => assert(nq(t) === 5L))
  }

  test("filtered recall eval: floors, monotonicity, exact anchors, adaptive engagement") {
    val rows = Ann.annFilteredRecallEval(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val filters = Seq("all", "tag_25pct", "rare_sub1pct", "range_tail")
    // 4 filters x (4 fixed nprobes + adaptive)
    assert(rows.size === 20)
    filters.foreach { f =>
      // recall is monotone non-decreasing in nprobe and EXACTLY 1.0 at
      // nprobe = nlist (all lists probed = the exact filtered scan)
      val curve = Seq("1", "2", "4", "8").map(np => rows((f, np))._3)
      assert(curve.sliding(2).forall(w => w(0) <= w(1)),
        s"$f recall not monotone: $curve")
      assert(rows((f, "8"))._3 === 1.0, s"$f full-probe recall must be 1.0")
      // the adaptive row never does worse than its base nprobe = 1
      assert(rows((f, "adaptive"))._3 >= rows((f, "1"))._3,
        s"$f adaptive below the base-probe recall")
      rows.foreach { case (_, (_, nq, r)) =>
        assert(nq === 8L && r >= 0.0 && r <= 1.0) }
    }
    // the switch ENGAGES on the selective tree: the sub-1% arm trips
    // the full-scan threshold and serves the exact answer (recall 1.0
    // at an effective nprobe of nlist); the 25% arm must NOT pay the
    // full scan (the estimator keeps cheap queries cheap)
    assert(rows(("rare_sub1pct", "adaptive"))._1 === 8L)
    assert(rows(("rare_sub1pct", "adaptive"))._3 === 1.0)
    assert(rows(("tag_25pct", "adaptive"))._1 < 8L)
    assert(rows(("all", "adaptive"))._1 === 1L)
    // ... and on the RANGE-selective arm (VERDICT r12 #3): the zone
    // histogram on vec_id sees the ~1/128 tail slice, trips the
    // full-scan switch, and the exact answer serves (the keyword-blind
    // estimator kept this row at nprobe 1 / collapsed recall)
    assert(rows(("range_tail", "adaptive"))._1 === 8L)
    assert(rows(("range_tail", "adaptive"))._3 === 1.0)
  }

  test("ivf balance audit accounts for every vector with consistent skew stats") {
    val rows = Ann.ivfBalance(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val corpusN = Tables.embeddings(spark, sf).count() - 10 // minus query batch
    assert(rows.map(_._2).sum === corpusN, "every vector in exactly one list")
    // imbalance = n_vectors * n_lists / total: mean over lists is 1 by
    // construction; max row's imbalance must match max_list_share * n_lists
    val nLists = rows.length
    val top = rows.maxBy(_._2)
    assert(math.abs(top._3 - top._4 * nLists) < 1e-2)
    rows.foreach { case (_, n, imb, share) =>
      assert(n > 0 && imb > 0 && share > 0 && share <= 1.0)
    }
    // rows ordered largest list first (the alarm reads the top row)
    assert(rows.map(_._2).toSeq === rows.map(_._2).sortBy(-_).toSeq)
  }
}
