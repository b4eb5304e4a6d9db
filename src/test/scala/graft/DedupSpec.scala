package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpecBase {

  test("minhashLsh finds exactly the pairs exact ngram-jaccard finds at 0.8") {
    val lsh = Dedup.minhashLsh(spark, sf, t = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccard(spark, sf, t = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh === exact) // banding tuned for recall ≈ 1; verify stage exact
    assert(exact.nonEmpty) // the synthetic corpus contains near-dups
  }

  test("ngramJaccard values are valid jaccards in [t, 1]") {
    Dedup.ngramJaccard(spark, sf, t = 0.7).collect().foreach { r =>
      val j = r.getDouble(2)
      assert(j >= 0.7 && j <= 1.0)
      assert(r.getLong(0) < r.getLong(1))
    }
  }

  test("simhash candidates have hamming <= 7 and include heavy-overlap docs") {
    val pairs = Dedup.simhash(spark, sf).collect()
    pairs.foreach(r => assert(r.getInt(2) <= 7))
    // near-identical docs (jaccard >= 0.9) should mostly be simhash-close
    val strong = Dedup.ngramJaccard(spark, sf, t = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val simSet = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    if (strong.nonEmpty) {
      val hit = strong.count(simSet.contains).toDouble / strong.size
      assert(hit >= 0.5, s"simhash recall on j>=0.95 pairs too low: $hit")
    }
  }

  test("simhash skew discipline: identical-sig clusters collapse, hot buckets are capped") {
    import spark.implicits._
    // 1) the realistic skew: 1000 docs share ONE signature — the sig-
    // level band join must see a single row (zero candidates), while
    // the pair output still carries every true hamming-0 pair
    val cluster = (0L until 1000L).map(i => (i, 0x0123456789ABCDEFL)).toDF("doc_id", "simhash")
    assert(Dedup.simhashSigCandidates(cluster, dfCap = 4096).count() === 0L,
      "identical signatures must not generate band candidates")
    assert(Dedup.simhashPairsOf(cluster, dfCap = 4096).count() === 1000L * 999L / 2,
      "within-signature true pairs must survive in the output")

    // 2) the low-entropy-block hazard: many DISTINCT signatures all
    // sharing bval=0 in block 0 (low 8 bits zero). Uncapped, the one
    // bucket is quadratic in distinct sigs; capped, its candidates are
    // bounded by C(dfCap, 2) per bucket.
    val nSigs = 200
    val lowEntropy = (0 until nSigs)
      .map(i => (i.toLong, (i.toLong << 8))).toDF("doc_id", "simhash")
    val uncapped = Dedup.simhashSigCandidates(lowEntropy, dfCap = Int.MaxValue).count()
    assert(uncapped >= nSigs.toLong * (nSigs - 1) / 2,
      s"low-entropy block must be quadratic uncapped, got $uncapped")
    val cap = 20
    val capped = Dedup.simhashSigCandidates(lowEntropy, dfCap = cap).count()
    // every OTHER block holds distinct bvals (df small), so survivors
    // come only from buckets under the cap: each contributes ≤ C(df,2)
    assert(capped <= 8L * cap * (cap - 1) / 2,
      s"capped candidate volume $capped exceeds the per-bucket bound")

    // 3) parity: at the gate corpus no bucket reaches the default cap,
    // so capped ≡ uncapped (the recall-1 regime the contract documents)
    val viaDefault = Dedup.simhash(spark, sf).collect().toSeq
    val viaUncapped = Dedup.simhash(spark, sf, dfCap = Int.MaxValue).collect().toSeq
    assert(viaDefault === viaUncapped)
  }

  test("exact dedup groups cover all docs") {
    val r = Dedup.exact(spark, sf)
    assert(r.agg(sum("n_dups")).head().getLong(0) === Tables.documents(spark, sf).count())
  }

  test("dupClusters labels every paired doc with its component's min doc_id") {
    val pairs = Dedup.minhashLsh(spark, sf, t = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.dupClusters(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // brute-force union-find on the driver as the oracle
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(x => x -> find(x)).toMap
    assert(clusters === expected)
    assert(clusters.nonEmpty)
  }

  test("LSH-bucketed embedding near-dup recalls the exact pair set sub-quadratically") {
    val exact = Dedup.embeddingNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact)) // verify step makes every emitted pair exact
    val recall = if (exact.isEmpty) 1.0 else (lsh & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH near-dup recall $recall (${lsh.size}/${exact.size})")
  }

  test("embeddingNearDup finds the 50 planted perturbed twins") {
    val pairs = Dedup.embeddingNearDup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val planted = pairs.filter { case (a, b) => b === a + 100000 }
    assert(planted.length === 50)
  }

  test("excision removes tokens exactly for the docs the span audit flags") {
    val spans = Dedup.dupSpans(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap // doc_id -> max_run
    val excised = Dedup.exciseDupSpans(spark, sf).collect()
    assert(excised.map(_.getLong(0)).toSet === spans.keySet)
    excised.foreach { r =>
      val (doc, nTok, nRem) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val maxRun = spans(doc)
      // a doc loses tokens iff the audit found a qualifying run; a run
      // of R grams covers R+w-1 tokens, so removal ≥ longest run + 4
      if (maxRun > 0) assert(nRem >= maxRun + 4 && nRem <= nTok,
        s"doc $doc removed $nRem of $nTok with max_run $maxRun")
      else assert(nRem === 0, s"doc $doc lost $nRem tokens but audit found no run")
    }
  }

  test("embeddingNearDup refuses a corpus past its all-pairs cap, pointing at the scale twins") {
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDup(spark, sf, maxRows = 10)
    }
    assert(e.getMessage.contains("O(n²)") && e.getMessage.contains("embeddingNearDupLsh"),
      s"guard message unhelpful: ${e.getMessage}")
  }

  test("IVF-bucketed embedding near-dup recalls the exact pair set sub-quadratically") {
    val exact = Dedup.embeddingNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Dedup.embeddingNearDupIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.subsetOf(exact)) // verify step makes every emitted pair exact
    val recall = if (exact.isEmpty) 1.0 else (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF near-dup recall $recall (${ivf.size}/${exact.size})")
  }

  test("dupSpans runs are consistent with the dup-ngram fraction audit") {
    val spans = Dedup.dupSpans(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
    val ngram = Dedup.dupNgramFraction(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(spans.nonEmpty)
    spans.foreach { case (id, (nGrams, nRuns, maxRun, ratio)) =>
      assert(ratio >= 0.0 && ratio <= 1.0, s"doc $id ratio $ratio")
      assert(maxRun <= nGrams, s"doc $id run $maxRun > $nGrams grams")
      assert((nRuns == 0) == (maxRun == 0L), s"doc $id runs/max inconsistent")
      // a doc with a >=3-gram duplicated run necessarily has duplicated
      // grams in the (positionless) ngram audit; span ratio only counts
      // run members so it can never exceed the per-gram dup ratio
      // (modulo the audit's per-doc distinct-gram denominator, compare
      // existence only)
      if (nRuns > 0) assert(ngram(id) > 0.0, s"doc $id has runs but no dup grams")
    }
    assert(spans.exists(_._2._2 > 0)) // planted near-dups produce runs
  }

  test("semanticDedup drops exactly the lower-priority members of clustered near-dup pairs") {
    val out = Dedup.semanticDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val exact = Dedup.embeddingNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sameCluster = exact.filter { case (a, b) => out(a)._1 == out(b)._1 }
    assert(sameCluster.nonEmpty) // the planted twins co-cluster
    // a near-dup pair sharing a cluster never survives whole
    sameCluster.foreach { case (a, b) =>
      assert(!(out(a)._2 && out(b)._2), s"near-dup pair ($a,$b) both kept")
    }
    // and nothing is dropped without a same-cluster near-dup justifying it
    val inPair = sameCluster.flatMap(p => Seq(p._1, p._2)).toSet
    out.collect { case (id, (_, false)) => id }
      .foreach(id => assert(inPair(id), s"$id dropped without a near-dup"))
  }

  test("containment pairs include every Jaccard>=0.9 pair and score in (0,1]") {
    val cont = Dedup.containment(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    cont.foreach { case (_, c) => assert(c >= 0.9 && c <= 1.0) }
    // containment >= jaccard pointwise, so the j>=0.9 pair set is a subset
    val jacc = Dedup.ngramJaccard(spark, sf, t = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val contKeys = cont.map(_._1).toSet
    assert(jacc.subsetOf(contKeys),
      s"missing ${(jacc -- contKeys).take(5)} of ${jacc.size} jaccard pairs")
  }

  test("hot-shingle df cap gates candidate generation but never the verify scores") {
    // default cap invisible on this corpus (max df = 4 ≪ 1024): the
    // capped run IS the exact answer
    val exact = Dedup.ngramJaccard(spark, sf, t = 0.7)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val uncapped = Dedup.ngramJaccard(spark, sf, t = 0.7, dfCap = Int.MaxValue)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(exact === uncapped && exact.nonEmpty)
    // a biting cap shrinks the CANDIDATE set only — surviving pairs keep
    // their exact (full-set) scores
    val capped = Dedup.ngramJaccard(spark, sf, t = 0.7, dfCap = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(capped.keySet.subsetOf(exact.keySet))
    capped.foreach { case (k, j) => assert(j === exact(k), s"score moved for $k") }
    // cap = 1 makes every SHARED gram hot (shared ⇒ df ≥ 2): zero
    // candidates survive, proving the gate sits before the pair join
    assert(Dedup.ngramJaccard(spark, sf, t = 0.7, dfCap = 1).count() === 0L)
    assert(Dedup.containment(spark, sf, dfCap = 1).count() === 0L)
  }

  test("incremental dedup verdicts are per-batch-doc and internally consistent") {
    val docs = Tables.documents(spark, sf)
    val nBatch = docs.filter(col("doc_id") % 10 === 0).count()
    val rows = Dedup.incrementalDedup(spark, sf).collect()
    assert(rows.length.toLong === nBatch) // one admission verdict per batch doc
    rows.foreach { r =>
      val (exact, containment, keep) = (r.getLong(1), r.getDouble(3), r.getLong(4))
      assert(containment >= 0.0 && containment <= 1.0)
      // keep ⇔ no exact twin AND sub-threshold gram containment
      assert(keep === (if (exact === 0L && containment < 0.5) 1L else 0L),
        s"inconsistent verdict row $r")
    }
  }

  test("bloom gate has no false negatives, bounded false positives, and is deterministic") {
    val docs = Tables.documents(spark, sf)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val index = docs.filter(col("doc_id") % 10 =!= 0)
    val bg = Dedup.shingleRows(batch, 8)
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
    val ig = Dedup.shingleRows(index, 8)
      .select(xxhash64(col("shingle")).as("h")).distinct()
    val exactHits = bg.join(ig, "h").groupBy("doc_id")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nMember = bg.join(ig, "h").count()
    val nGramRows = bg.count()
    val rows = Dedup.bloomGate(spark, sf).collect()
    var bloomHits = 0L
    rows.foreach { r =>
      val (doc, nGrams, nHit) = (r.getLong(0), r.getLong(1), r.getLong(2))
      bloomHits += nHit
      // one-sided error: every true member gram probes true
      assert(nHit >= exactHits.getOrElse(doc, 0L), s"false negative on doc $doc")
      assert(nHit <= nGrams)
    }
    // false-positive rate over the non-member gram rows
    val fp = (bloomHits - nMember).toDouble / math.max(1L, nGramRows - nMember)
    assert(fp < 0.05, s"bloom FP rate $fp")
    // bit-union state is order-independent → rerun is identical
    assert(Dedup.bloomGate(spark, sf).collect().toSeq === rows.toSeq)
  }

  test("dedup tier evaluation: minhash holds recall and precision 1.0 vs exact truth") {
    val rows = Dedup.dedupRecallEval(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(rows.keySet === Set("minhash_lsh", "simhash", "containment"))
    rows.foreach { case (m, (nTrue, nFound, nHit, recall, precision)) =>
      assert(nHit <= math.min(nTrue, nFound), s"$m hit count exceeds a side")
      assert(recall >= 0 && recall <= 1 && precision >= 0 && precision <= 1, m)
    }
    // banding is tuned for recall 1 then exact-verified → identical set
    val (_, _, _, r, p) = rows("minhash_lsh")
    assert(r === 1.0 && p === 1.0, s"minhash drifted from the exact set: $rows")
  }

  test("band tuning walks the LSH s-curve: more bands -> recall up, precision down-or-equal") {
    val rows = Dedup.minhashBandTuning(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(8L, 16L, 32L, 64L))
    rows.foreach { case (b, rpb, _, _, _, _) => assert(b * rpb === 128L) }
    // candidate volume and recall are monotone non-decreasing in bands
    val cands = rows.map(_._3); val recalls = rows.map(_._5)
    assert(cands.toSeq === cands.sorted.toSeq, s"candidates not monotone: ${cands.toSeq}")
    assert(recalls.toSeq === recalls.sorted.toSeq, s"recall not monotone: ${recalls.toSeq}")
    // the production config (32, 4) must hold the tier's recall floor
    val r32 = rows.find(_._1 == 32L).get
    assert(r32._5 >= 0.99, s"b32r4 candidate recall ${r32._5}")
  }

  test("attrition funnel is monotone and consistent with the cluster histogram") {
    val r = Dedup.attritionFunnel(spark, sf).head()
    val (nIn, nExact, nNear) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nIn >= nExact && nExact >= nNear, s"funnel not monotone: $r")
    assert(r.getLong(3) >= r.getLong(4)) // tokens shrink with docs
    // docs removed by the near stage = Σ n_removed of the histogram
    val removed = Dedup.dupClusterStats(spark, sf).collect().map(_.getLong(3)).sum
    assert(nIn - nNear === removed, s"funnel vs histogram: $r vs $removed")
  }

  test("bloom gate admits a subset of the exact incremental gate") {
    val exactKeep = Dedup.incrementalDedup(spark, sf).collect()
      .filter(r => r.getDouble(3) < 0.5).map(_.getLong(0)).toSet
    val bloomKeep = Dedup.bloomGate(spark, sf).collect()
      .filter(_.getLong(4) === 1L).map(_.getLong(0)).toSet
    // bloom containment ≥ exact containment, so bloom-admitted ⊆ exact-admitted
    assert(bloomKeep.subsetOf(exactKeep),
      s"bloom admitted ${(bloomKeep -- exactKeep).take(5)} that exact rejects")
  }

  test("trainValSplit counts exactly the cross-split near-dup docs") {
    val rows = Dedup.trainValSplit(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    assert(rows.map(_.getString(0)).toSeq.sorted === Seq("train", "val"))
    assert(rows.map(_.getLong(1)).sum === docs.count())
    // driver reference: same split rule + the pair relation
    val split = docs.select(col("doc_id"),
        conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long").as("b"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1) < 6553L)).toMap
    val pairs = Dedup.ngramJaccard(spark, sf).select("ia", "ib").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val leaky = pairs.filter { case (a, b) => split(a) != split(b) }
      .flatMap { case (a, b) => Seq(a, b) }.toSet
    val expVal = leaky.count(split(_))
    val expTrain = leaky.size - expVal
    val byS = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byS("val") === expVal && byS("train") === expTrain,
      s"leak counts $byS vs ref val=$expVal train=$expTrain")
  }

  test("splitByCluster never lets a near-dup pair straddle the split") {
    val rows = Dedup.splitByCluster(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    assert(rows.map(_.getString(0)).toSeq.sorted === Seq("train", "val"))
    assert(rows.map(_.getLong(1)).sum === docs.count())
    rows.foreach(r => assert(r.getLong(3) === 0L, s"cluster split leaked: $r"))
    // driver reference: union-find over the pair relation + the md5
    // label-hash split rule — every pair must land same-side and the
    // rollup (docs, clusters) must match exactly
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val pairs = Dedup.ngramJaccard(spark, sf).select("ia", "ib").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = ids.map(i => i -> find(i)).toMap
    def isVal(l: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(l.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(2).map("%02x".format(_)).mkString, 16) < 6553L
    }
    pairs.foreach { case (a, b) =>
      assert(isVal(label(a)) === isVal(label(b)), s"pair ($a,$b) straddles")
    }
    val byS = rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val valDocs = ids.filter(i => isVal(label(i)))
    assert(byS("val")._1 === valDocs.length)
    assert(byS("val")._2 === valDocs.map(label).distinct.length)
    assert(byS("train")._2 ===
      ids.filterNot(i => isVal(label(i))).map(label).distinct.length)
  }

  test("contaminationBySource matches a driver set-intersection reference") {
    val rows = Dedup.contaminationBySource(spark, sf).collect()
    val evalSrc = Set("src0", "src1", "src2", "src3")
    val docs = Tables.documents(spark, sf).select("doc_id", "text", "source")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def grams(t: String): Set[Seq[String]] =
      t.split(" ").sliding(8).filter(_.length == 8).map(_.toSeq).toSet
    val ev = docs.filter(d => evalSrc(d._3)).map(d => (d._1, grams(d._2)))
    val tr = docs.filterNot(d => evalSrc(d._3)).map(d => (d._1, d._3, grams(d._2)))
    // df cap is invisible at this SF (max train df << 1024)
    val pairs = for {
      (eid, eg) <- ev; (tid, src, tg) <- tr
      shared = eg.intersect(tg).size if shared >= 3
    } yield (src, tid, eid, shared)
    val bySrc = pairs.groupBy(_._1)
    assert(rows.map(_.getString(0)).toSet === bySrc.keySet)
    rows.foreach { r =>
      val ps = bySrc(r.getString(0))
      assert(r.getLong(1) === ps.map(_._2).distinct.length.toLong)
      assert(r.getLong(2) === ps.map(_._3).distinct.length.toLong)
      assert(r.getLong(3) === ps.length.toLong)
      assert(r.getLong(4) === ps.map(_._4).max.toLong)
    }
  }

  test("candidateCostReport accounts every gram's quadratic exactly") {
    val rows = Dedup.candidateCostReport(spark, sf).collect()
    // driver reference off the gram dfs
    val dfs = Dedup.shingleRows(Tables.documents(spark, sf), 5)
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("df")).collect().map(_.getLong(1))
    assert(rows.map(_.getLong(1)).sum === dfs.length.toLong)
    val expPairs = dfs.map(d => BigInt(d) * (d - 1) / 2).sum
    assert(rows.map(r => BigInt(r.getLong(2))).sum === expPairs)
    // bucket arithmetic: every df in bucket b satisfies 2^b <= df < 2^(b+1)
    val buckets = rows.map(_.getLong(0))
    assert(buckets.toSeq === buckets.sorted.toSeq)
    assert(buckets.head === 0L) // df=1 grams exist in any natural corpus
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 0.01)
  }

  test("sourceOverlap partitions the pair relation with exact argmax evidence") {
    val rows = Dedup.sourceOverlap(spark, sf).collect()
    val pairs = Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rows.map(_.getLong(2)).sum === pairs.size.toLong)
    val src = Tables.documents(spark, sf).select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      assert(sa <= sb)
      val (ia, ib) = (r.getLong(4), r.getLong(5))
      // the evidence pair really belongs to this cell at this score
      assert(Seq(src(ia), src(ib)).sorted === Seq(sa, sb))
      assert(pairs((ia, ib)) === r.getDouble(3))
      // and it is the cell's max
      val cellMax = pairs.collect { case ((a, b), jc)
        if Seq(src(a), src(b)).sorted == Seq(sa, sb) => jc }.max
      assert(r.getDouble(3) === cellMax)
    }
  }

  test("dupRateBySource attributes exactly the ngramJaccard removable set") {
    val rows = Dedup.dupRateBySource(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    assert(rows.map(_.getLong(1)).sum === docs.count())
    // near-dup totals must equal the distinct higher-id side of the pair relation
    val removable = Dedup.ngramJaccard(spark, sf)
      .select("ib").distinct().count()
    assert(rows.map(_.getLong(3)).sum === removable)
    rows.foreach { r =>
      val (n, ne, nn, rate) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(ne <= n && nn <= n)
      assert(rate >= 0.0 && rate <= 1.0)
      // rate covers the union, so it is at least each tier's own share
      assert(rate >= math.max(ne, nn).toDouble / n - 1e-4)
    }
  }
}
