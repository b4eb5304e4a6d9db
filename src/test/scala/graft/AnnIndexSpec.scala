package graft

import graft.api.AnnIndex
import graft.functions.Vectors._
import org.apache.spark.sql.functions._

class AnnIndexSpec extends SparkSpecBase {

  private lazy val corpus = Tables.embeddings(spark, sf)
    .select(col("vec_id"), toDouble(col("embedding")).as("vec"))

  private def tmp(n: String) =
    java.nio.file.Files.createTempDirectory(s"annidx-$n").toString + "/idx"

  test("build persists nlist partitions and centroids round-trip via load") {
    val path = tmp("roundtrip")
    val built = AnnIndex.build(corpus, path, nlist = 8)
    assert(built.centroids.length === 8)
    val loaded = AnnIndex.load(spark, path)
    assert(loaded.centroids.map(_._1).toSeq === (0 until 8))
    (built.centroids zip loaded.centroids).foreach { case ((_, a), (_, b)) =>
      assert(a.toSeq === b.toSeq) // centroids survive the round-trip exactly
    }
    // every corpus row landed in exactly one list
    assert(spark.read.parquet(path).count() === corpus.count())
  }

  test("search prunes partitions and finds an indexed vector via its own list") {
    val path = tmp("search")
    val idx = AnnIndex.build(corpus, path, nlist = 8)
    val qvec = corpus.filter(col("vec_id") === 42).head().getSeq[Double](1)
    val hits = idx.search(qvec, k = 5, nprobe = 2)
    // the probed list containing vec 42 must return it at rank 1 (cos = 1)
    val top = hits.head()
    assert(top.getLong(0) === 42L)
    assert(math.abs(top.getDouble(1) - 1.0) < 1e-9)
    // partition pruning reaches the scan
    val plan = hits.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("list#"), plan)
  }

  test("payload filter composes with probe pruning") {
    val path = tmp("filtered")
    val withPayload = corpus.withColumn("tenant", col("vec_id") % 4)
    val idx = AnnIndex.build(withPayload, path, nlist = 4)
    val qvec = corpus.filter(col("vec_id") === 42).head().getSeq[Double](1)
    val hits = AnnIndex.load(spark, path)
      .search(qvec, k = 20, nprobe = 4, filter = Some(col("tenant") === 1))
      .collect()
    assert(hits.nonEmpty)
    // every hit obeys the tenant predicate (vec_id % 4 == 1)
    hits.foreach(r => assert(r.getLong(0) % 4 === 1L, s"tenant leak: ${r.getLong(0)}"))
  }

  test("probing all lists equals brute force exactly") {
    val path = tmp("full")
    val idx = AnnIndex.build(corpus, path, nlist = 4)
    val qvec = corpus.filter(col("vec_id") === 7).head().getSeq[Double](1)
    val ivf = idx.search(qvec, k = 10, nprobe = 4).collect().map(_.getLong(0))
    val q = array(qvec.map(lit): _*)
    val brute = corpus.select(col("vec_id"), cosineSim(col("vec"), q).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0))
    assert(ivf.toSeq === brute.toSeq)
  }

  test("searchFilter: the full filter object ≡ brute force over the same predicate") {
    import graft.api.Filters._
    val path = tmp("pfilter")
    val withPayload = corpus
      .withColumn("tag", concat(lit("t"), (col("vec_id") % 4).cast("string")))
      .withColumn("label", col("vec_id") % 10)
    val idx = AnnIndex.build(withPayload, path, nlist = 4, keyword = Seq("tag"))
    val qvec = corpus.filter(col("vec_id") === 7).head().getSeq[Double](1)
    // composed tree: keyword-axis equality + open integer bound +
    // must_not range — probing ALL lists makes the route exact
    val f = PFilter(
      must = Seq(MatchValue("tag", "t1"), IntBounds("vec_id", gte = Some(100L))),
      mustNot = Seq(RangeInt("label", 0, 1)))
    val got = idx.searchFilter(qvec, f, k = 10, nprobe = 4)
      .collect().map(_.getLong(0))
    val q = array(qvec.map(lit): _*)
    val brute = withPayload
      .filter(col("vec_id") % 4 === 1 && col("vec_id") >= 100 &&
        !col("label").between(0, 1))
      .select(col("vec_id"), cosineSim(col("vec"), q).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0))
    assert(got.toSeq === brute.toSeq)
    assert(got.nonEmpty &&
      got.forall(id => id % 4 == 1 && id >= 100 && id % 10 > 1))
    // the keyword arm stays a raw partition-column comparison in the
    // filter-context compile, so the catalog prunes its directory
    // (composing with the probes' list pruning)
    val plan = idx.searchFilter(qvec, f, 10, 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tag#"), plan)
    // unknown fields refuse loudly at the API boundary
    intercept[IllegalArgumentException](
      idx.searchFilter(qvec, PFilter(must = Seq(MatchValue("nope", "x"))), 5))
  }

  test("adaptive filtered search: estimator, probe widening, full-scan switch, exactness") {
    import graft.api.Filters._
    val path = tmp("adaptive")
    // `grp` is a 1%-selective keyword axis (hot every 100th id) — the
    // regime where fixed-nprobe filtered recall collapses
    val withPayload = corpus
      .withColumn("grp", when(col("vec_id") % 100 === 0, lit("hot"))
        .otherwise(lit("cold")))
      .withColumn("label", col("vec_id") % 10)
    val idx = AnnIndex.build(withPayload, path, nlist = 8, keyword = Seq("grp"))
    val n = withPayload.count()
    val nHot = withPayload.filter(col("grp") === "hot").count()
    val qvec = corpus.filter(col("vec_id") === 7).head().getSeq[Double](1)
    val hot = PFilter(must = Seq(MatchValue("grp", "hot")))
    val cold = PFilter(must = Seq(MatchValue("grp", "cold")))
    // --- estimator: exact keyword-axis shares, clause combination,
    // unknown arms -> 1.0 (upper bound)
    assert(math.abs(idx.estimateSelectivity(hot) - nHot.toDouble / n) < 1e-12)
    assert(math.abs(idx.estimateSelectivity(cold) - (n - nHot).toDouble / n) < 1e-12)
    assert(math.abs(idx.estimateSelectivity(PFilter(
      mustNot = Seq(MatchValue("grp", "hot")))) - (n - nHot).toDouble / n) < 1e-12)
    // a RANGE arm is no longer the blind 1.0 (VERDICT r12 #3): the
    // zone histogram bounds it from above, never below the true share
    val trueShare400 = withPayload.filter(col("vec_id") >= 400).count().toDouble / n
    val est400 = idx.estimateSelectivity(PFilter(
      must = Seq(IntBounds("vec_id", gte = Some(400L)))))
    assert(est400 <= 1.0 && est400 >= trueShare400 - 1e-12)
    assert(est400 < 1.0, "a selective range arm must estimate below 1")
    // conditions NO stats axis can see stay at the 1.0 upper bound
    assert(idx.estimateSelectivity(PFilter(
      must = Seq(MatchText("grp", Seq("hot"))))) === 1.0)
    assert(idx.estimateSelectivity(PFilter(must = Seq(
      MatchAny("grp", Seq("hot", "cold"))))) === 1.0)
    // should: all-known arms sum (capped at 1); any unknown arm makes
    // the clause estimate 1.0 (it could match everything)
    assert(math.abs(idx.estimateSelectivity(PFilter(
      should = Seq(MatchValue("grp", "hot"), MatchValue("grp", "hot"))))
      - 2.0 * nHot / n) < 1e-12)
    assert(idx.estimateSelectivity(PFilter(should = Seq(
      MatchValue("grp", "hot"), MatchText("grp", Seq("hot"))))) === 1.0)
    // ... and a known whole-range arm caps the sum at 1 the same way
    assert(idx.estimateSelectivity(PFilter(should = Seq(
      MatchValue("grp", "hot"), IntBounds("vec_id", gte = Some(0L))))) === 1.0)
    // must combines multiplicatively with the should estimate
    assert(math.abs(idx.estimateSelectivity(PFilter(
      must = Seq(MatchValue("grp", "hot")),
      should = Seq(MatchValue("grp", "cold"))))
      - (nHot.toDouble / n) * ((n - nHot).toDouble / n)) < 1e-12)
    // --- full-scan switch (Qdrant's full_scan_threshold): estimated
    // matches below the threshold serve the exact pruned scan
    assert(idx.planProbes(qvec, hot, k = 5, nprobe = 1,
      fullScanThreshold = nHot + 1) === 8)
    // --- probe widening: threshold out of the way, the starved hot
    // arm widens to nlist; the 99% cold arm stays at the base probe
    assert(idx.planProbes(qvec, hot, k = 5, nprobe = 1,
      candidateFactor = 4.0, fullScanThreshold = 0L) === 8)
    assert(idx.planProbes(qvec, cold, k = 5, nprobe = 1,
      candidateFactor = 1.0, fullScanThreshold = 0L) === 1)
    // --- engaged switch = the exact filtered answer (brute parity)
    val got = idx.searchFilterAdaptive(qvec, hot, k = 5, nprobe = 1)
      .collect().map(_.getLong(0))
    val q = array(qvec.map(lit): _*)
    val brute = withPayload.filter(col("grp") === "hot")
      .select(col("vec_id"), cosineSim(col("vec"), q).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(5)
      .collect().map(_.getLong(0))
    assert(got.toSeq === brute.toSeq && got.nonEmpty)
    // --- recall floor: adaptive >= the fixed base-nprobe route on the
    // selective tree (the collapse the switch exists to prevent)
    val fixed = idx.searchFilter(qvec, hot, k = 5, nprobe = 1)
      .collect().map(_.getLong(0)).toSet
    val truth = brute.toSet
    assert((got.toSet & truth).size >= (fixed & truth).size)
  }

  test("incremental insert assigns to existing lists and is immediately searchable") {
    val path = tmp("insert")
    val oldHalf = corpus.filter(col("vec_id") % 2 === 0)
    val newHalf = corpus.filter(col("vec_id") % 2 =!= 0)
    val idx = AnnIndex.build(oldHalf, path, nlist = 4)
    val centsBefore = idx.centroids.map(_._2.toSeq)
    idx.insert(newHalf)
    // nothing rewritten: totals add up and the quantizer did not move
    assert(spark.read.parquet(path).count() === corpus.count())
    assert(AnnIndex.load(spark, path).centroids.map(_._2.toSeq).toSeq
      === centsBefore.toSeq)
    // an inserted vector is found through its own (assigned) list
    val qvec = newHalf.filter(col("vec_id") === 7).head().getSeq[Double](1)
    assert(idx.search(qvec, k = 3, nprobe = 1).head().getLong(0) === 7L)
    // full probe over the merged corpus still equals brute force
    val ivf = idx.search(qvec, k = 10, nprobe = 4).collect().map(_.getLong(0))
    val q = array(qvec.map(lit): _*)
    val brute = corpus.select(col("vec_id"), cosineSim(col("vec"), q).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0))
    assert(ivf.toSeq === brute.toSeq)
  }

  test("keyword axes prune directories multiplicatively with the probe set") {
    val path = tmp("kwaxes")
    val tagged = corpus.withColumn("lang",
      when(col("vec_id") % 3 === 0, "en")
        .when(col("vec_id") % 3 === 1, "fr").otherwise("de"))
    val idx = AnnIndex.build(tagged, path, nlist = 4, keyword = Seq("lang"))
    assert(idx.keywordFields === Seq("lang"))
    // layout: lang=…/list=… — both axes are directories
    val root = new java.io.File(path)
    val langs = root.listFiles().filter(_.getName.startsWith("lang="))
    assert(langs.length === 3)
    assert(langs.head.listFiles().exists(_.getName.startsWith("list=")))

    val qvec = corpus.filter(col("vec_id") === 42).head().getSeq[Double](1)
    def scanned(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.selectedPartitions.toPartitionArray.map(_.filePath.toString).toSeq
      }.flatten
    val unfiltered = scanned(idx.search(qvec, k = 5, nprobe = 2))
    val filtered = scanned(idx.search(qvec, k = 5, nprobe = 2,
      eq = Map("lang" -> Seq("fr"))))
    // the filtered probe reads a strict subset: only fr directories,
    // and never more files than the unfiltered probe
    assert(filtered.nonEmpty && filtered.length < unfiltered.length)
    assert(filtered.forall(_.contains("/lang=fr/")),
      s"unpruned file: ${filtered.find(f => !f.contains("/lang=fr/"))}")

    // results = the residual-filter form exactly (layout never changes
    // answers, only I/O) — full probe so both sides are exhaustive
    val viaEq = idx.search(qvec, k = 10, nprobe = 4,
      eq = Map("lang" -> Seq("fr"))).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val viaFilter = idx.search(qvec, k = 10, nprobe = 4,
      filter = Some(col("lang") === "fr")).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(viaEq.toSeq === viaFilter.toSeq)
    assert(viaEq.nonEmpty)

    // an unindexed eq axis is refused, not silently scan-filtered
    intercept[IllegalArgumentException](
      idx.search(qvec, eq = Map("tenant" -> Seq("1"))))
  }

  test("keyword-axis manifest survives load and insert lands on both axes") {
    val path = tmp("kwinsert")
    val tagged = corpus.withColumn("lang",
      when(col("vec_id") % 2 === 0, "en").otherwise("fr"))
    val oldHalf = tagged.filter(col("vec_id") < 30)
    val newHalf = tagged.filter(col("vec_id") >= 30)
    AnnIndex.build(oldHalf, path, nlist = 4, keyword = Seq("lang"))
    val idx = AnnIndex.load(spark, path)
    assert(idx.keywordFields === Seq("lang")) // manifest round-trips
    idx.insert(newHalf)
    assert(spark.read.parquet(path).count() === tagged.count())
    // an inserted vector is reachable through a keyword-pruned probe
    val qvec = corpus.filter(col("vec_id") === 31).head().getSeq[Double](1)
    val hits = idx.search(qvec, k = 3, nprobe = 4,
      eq = Map("lang" -> Seq("fr"))).collect()
    assert(hits.head.getLong(0) === 31L)
  }

  test("an in-place rebuild without keyword axes clears the stale axis manifest") {
    val path = tmp("kwrebuild")
    val tagged = corpus.withColumn("lang",
      when(col("vec_id") % 2 === 0, "en").otherwise("fr"))
    AnnIndex.build(tagged, path, nlist = 4, keyword = Seq("lang"))
    assert(AnnIndex.load(spark, path).keywordFields === Seq("lang"))
    // rebuild WITHOUT axes over the same path: the manifest must follow
    // the layout, or load would claim axes the data is not partitioned
    // by (insert would mix partition depths, eq would claim pruning)
    AnnIndex.build(corpus, path, nlist = 4)
    val rebuilt = AnnIndex.load(spark, path)
    assert(rebuilt.keywordFields === Seq.empty)
    val qvec = corpus.filter(col("vec_id") === 7).head().getSeq[Double](1)
    intercept[IllegalArgumentException](
      rebuilt.search(qvec, eq = Map("lang" -> Seq("en"))))
    assert(rebuilt.search(qvec, k = 3, nprobe = 4).head().getLong(0) === 7L)
  }

  test("insertCommitted is exactly-once: replay skips, torn attempts are swept") {
    import spark.implicits._
    val path = tmp("committed")
    // tiny deterministic corpus with a keyword axis — both partition
    // axes exercise the intent's dest-relative directory names
    val seed = (1L to 16L).map(i =>
      (i, Seq((i % 4).toDouble, i / 10.0), s"s${i % 2}"))
      .toDF("vec_id", "vec", "site")
    AnnIndex.build(seed, path, nlist = 2, keyword = Seq("site"))
    val idx = AnnIndex.load(spark, path)
    val b1 = Seq((100L, Seq(0.1, 0.1), "s0")).toDF("vec_id", "vec", "site")
    idx.insertCommitted(b1, 1L)
    assert(spark.read.parquet(path).count() === 17L)
    // replay of a COMMITTED batch is a no-op — the at-least-once
    // duplicate insert() would take here
    idx.insertCommitted(b1, 1L)
    assert(spark.read.parquet(path).count() === 17L)
    assert(new java.io.File(s"${path}_meta/batches/batch-1").exists())
    assert(!new java.io.File(s"${path}_meta/batches/intent-1").exists(),
      "committed batch must retire its publish intent")
    // TORN attempt of batch 2: a b2- prefixed duplicate sits in a
    // published dir and the intent (written before the first rename)
    // names that dir — no marker. The replay must sweep it and publish
    // exactly once, listing ONLY the intent's directories.
    def findPart(dir: java.io.File): Option[java.io.File] = {
      val es = dir.listFiles().sortBy(_.getName)
      es.find(f => f.isFile && f.getName.startsWith("part-"))
        .orElse(es.filter(_.isDirectory).flatMap(findPart).headOption)
    }
    val torn = findPart(new java.io.File(path)).get
    java.nio.file.Files.copy(torn.toPath,
      torn.toPath.resolveSibling("b2-" + torn.getName))
    val tornDir = new java.io.File(path).toPath.relativize(
      torn.getParentFile.toPath).toString
    val meta = new java.io.File(s"${path}_meta/batches")
    java.nio.file.Files.write(new java.io.File(meta, "intent-2").toPath,
      tornDir.getBytes("UTF-8"))
    assert(spark.read.parquet(path).count() > 17L,
      "precondition: the torn file duplicates rows")
    AnnIndex.load(spark, path)
      .insertCommitted(Seq((101L, Seq(0.9, 0.9), "s1"))
        .toDF("vec_id", "vec", "site"), 2L)
    assert(spark.read.parquet(path).count() === 18L,
      "torn duplicate must be swept, batch published once")
    // the published rows serve through search with the keyword axis
    val hits = AnnIndex.load(spark, path)
      .search(Seq(0.1, 0.1), k = 20, nprobe = 2, eq = Map("site" -> Seq("s0")))
      .collect().map(_.getLong(0))
    assert(hits.contains(100L))
  }

  test("insertCommitted replay converges when everything moved but the marker never committed") {
    import spark.implicits._
    val path = tmp("unmarked")
    val seed = (1L to 8L).map(i => (i, Seq((i % 2).toDouble, i / 10.0)))
      .toDF("vec_id", "vec")
    AnnIndex.build(seed, path, nlist = 2)
    val b3 = Seq((50L, Seq(0.5, 0.5))).toDF("vec_id", "vec")
    AnnIndex.load(spark, path).insertCommitted(b3, 3L)
    // rewind to the crashed state: marker gone, intent restored from
    // the actually-published b3- file locations
    val marker = new java.io.File(s"${path}_meta/batches/batch-3")
    assert(marker.exists()); assert(marker.delete())
    def prefixed(dir: java.io.File): Seq[java.io.File] = {
      val es = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
      es.filter(f => f.isFile && f.getName.startsWith("b3-")) ++
        es.filter(_.isDirectory).flatMap(prefixed)
    }
    val moved = prefixed(new java.io.File(path))
    assert(moved.nonEmpty, "precondition: b3- files were published")
    val rootP = new java.io.File(path).toPath
    val dirs = moved.map(f =>
      rootP.relativize(f.getParentFile.toPath).toString).distinct
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"${path}_meta/batches/intent-3"),
      dirs.mkString("\n").getBytes("UTF-8"))
    AnnIndex.load(spark, path).insertCommitted(b3, 3L)
    assert(spark.read.parquet(path).count() === 9L,
      "fully-moved-but-unmarked batch must republish exactly once")
    assert(new java.io.File(s"${path}_meta/batches/batch-3").exists())
  }

  test("zone histograms bound range-arm selectivity: exact on aligned bounds, switch engages") {
    import graft.api.Filters._
    val path = tmp("zones")
    // `band` takes exactly 64 integer values 0..63 — one per stats
    // zone (64 equi-width zones over [0, 63] put each integer in its
    // own zone), so ANY integer bound is zone-aligned and the estimate
    // is EXACT, not just an upper bound
    val withBand = corpus.withColumn("band", col("vec_id") % 64)
    val idx = AnnIndex.build(withBand, path, nlist = 8)
    val n = withBand.count().toDouble
    def share(c: org.apache.spark.sql.Column): Double =
      withBand.filter(c).count() / n
    val quarter = PFilter(must = Seq(IntBounds("band",
      gte = Some(16L), lte = Some(31L))))
    assert(math.abs(idx.estimateSelectivity(quarter)
      - share(col("band").between(16, 31))) < 1e-12)
    // closed-range shorthand and float bounds ride the same histogram
    assert(math.abs(idx.estimateSelectivity(RangeInt("band", 0L, 7L))
      - share(col("band").between(0, 7))) < 1e-12)
    assert(math.abs(idx.estimateSelectivity(FloatBounds("band",
      gte = Some(16.0), lte = Some(31.0)))
      - share(col("band").between(16, 31))) < 1e-12)
    // open-ended bound; a whole-span bound estimates exactly 1
    assert(math.abs(idx.estimateSelectivity(IntBounds("band", gte = Some(56L)))
      - share(col("band") >= 56)) < 1e-12)
    assert(idx.estimateSelectivity(IntBounds("band", gte = Some(0L))) === 1.0)
    // an impossible range estimates 0 (and would trivially full-scan)
    assert(idx.estimateSelectivity(IntBounds("band", gt = Some(64L))) === 0.0)
    // upper-bound property on a NON-aligned field (vec_id spans more
    // than 64 distinct values, so zones are coarser than the bounds)
    val trueNarrow = share(col("vec_id") < 5)
    val estNarrow = idx.estimateSelectivity(IntBounds("vec_id", lt = Some(5L)))
    assert(estNarrow >= trueNarrow - 1e-12 && estNarrow <= 1.0)
    // the FULL-SCAN SWITCH engages on a range-selective filter
    // (VERDICT r12 #3 — the blind 1.0 kept it from ever engaging):
    // threshold above the slice's estimated mass → nprobe = nlist,
    // and the served answer is the exact filtered brute force
    val qvec = corpus.filter(col("vec_id") === 7).head().getSeq[Double](1)
    val est = idx.estimateSelectivity(quarter)
    val threshold = (est * n).toLong + 2
    assert(idx.planProbes(qvec, quarter, k = 5, nprobe = 1,
      fullScanThreshold = threshold) === 8)
    val got = idx.searchFilterAdaptive(qvec, quarter, k = 5, nprobe = 1,
      fullScanThreshold = threshold).collect().map(_.getLong(0))
    val q = array(qvec.map(lit): _*)
    val brute = withBand.filter(col("band").between(16, 31))
      .select(col("vec_id"), cosineSim(col("vec"), q).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(5)
      .collect().map(_.getLong(0))
    assert(got.toSeq === brute.toSeq && got.nonEmpty)
  }

  test("ingest invalidates the planner stats: estimates follow the grown corpus") {
    import graft.api.Filters._
    import spark.implicits._
    val path = tmp("statsinval")
    // seed: every row hot; batch: three cold rows per hot row — the
    // hot share drops 4× after insert, and the planner must see it
    val seed = (0L until 32L).map(i =>
      (i, Seq((i % 4).toDouble, i / 10.0), "hot")).toDF("vec_id", "vec", "grp")
    val idx = AnnIndex.build(seed, path, nlist = 2, keyword = Seq("grp"))
    val hot = PFilter(must = Seq(MatchValue("grp", "hot")))
    assert(math.abs(idx.estimateSelectivity(hot) - 1.0) < 1e-12)
    assert(idx.statsRows === 32L)
    val batch = (100L until 196L).map(i =>
      (i, Seq((i % 4).toDouble, i / 10.0), "cold")).toDF("vec_id", "vec", "grp")
    idx.insert(batch)
    // ADVICE r12: without invalidation these read the STALE 1.0 / 32
    assert(math.abs(idx.estimateSelectivity(hot) - 0.25) < 1e-12)
    assert(idx.statsRows === 128L)
    // the committed path invalidates too
    idx.insertCommitted(Seq((200L, Seq(0.1, 0.1), "cold"))
      .toDF("vec_id", "vec", "grp"), 7L)
    assert(idx.statsRows === 129L)
    // a replayed (skipped) batch leaves the stats it already has
    idx.insertCommitted(Seq((200L, Seq(0.1, 0.1), "cold"))
      .toDF("vec_id", "vec", "grp"), 7L)
    assert(idx.statsRows === 129L)
  }

  test("keyword stats fill refuses a mis-declared high-cardinality axis loudly") {
    import graft.api.Filters._
    import spark.implicits._
    val path = tmp("statsguard")
    val seed = (0L until 16L).map(i =>
      (i, Seq((i % 4).toDouble, i / 10.0), s"v$i")).toDF("vec_id", "vec", "tag")
    val built = AnnIndex.build(seed, path, nlist = 2, keyword = Seq("tag"))
    // a handle sized for ≤ 8 distinct values trips at STATS FILL time
    // (before the driver map grows), naming the axis
    val guarded = new AnnIndex(spark, path, built.centroids, Seq("tag"),
      maxKeywordStatsDistinct = 8)
    val e = intercept[IllegalArgumentException](
      guarded.estimateSelectivity(PFilter(must = Seq(MatchValue("tag", "v1")))))
    assert(e.getMessage.contains("tag") && e.getMessage.contains("distinct"))
    // the production default is far above any sane axis: the same
    // 16-distinct layout fills fine there
    assert(built.estimateSelectivity(PFilter(
      must = Seq(MatchValue("tag", "v1")))) > 0.0)
  }

  test("deleteTo: survivors exact, quantizer carries, untouched keyword dirs byte-copy") {
    import graft.api.Filters._
    val root = java.nio.file.Files.createTempDirectory("annidx-del").toString
    val path = root + "/idx"
    val withPayload = corpus
      .withColumn("tag", concat(lit("t"), (col("vec_id") % 4).cast("string")))
      .withColumn("label", col("vec_id") % 10)
    val idx = AnnIndex.build(withPayload, path, nlist = 4, keyword = Seq("tag"))
    val doomed = col("tag") === "t1" && col("vec_id") >= 100
    val dst = root + "/rotated"
    val f = PFilter(must = Seq(MatchValue("tag", "t1"),
      IntBounds("vec_id", gte = Some(100L))))
    val rotated = idx.deleteTo(dst, f)
    // survivors are EXACTLY the non-matching rows (payload intact)
    val got = rotated.points.select("vec_id", "tag", "label").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val want = withPayload.filter(!doomed).select("vec_id", "tag", "label")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sorted.toSeq
    assert(got === want && got.length < corpus.count())
    // the quantizer and axis manifest travel — load() round-trips
    val reloaded = AnnIndex.load(spark, dst)
    assert(reloaded.centroids.map(_._2.toSeq).toSeq ===
      idx.centroids.map(_._2.toSeq).toSeq)
    assert(reloaded.keywordFields === Seq("tag"))
    // full probe over the rotation ≡ brute force over the survivors
    val qvec = corpus.filter(col("vec_id") === 7).head().getSeq[Double](1)
    val ivf = reloaded.search(qvec, k = 10, nprobe = 4).collect().map(_.getLong(0))
    val q = array(qvec.map(lit): _*)
    val brute = withPayload.filter(!doomed)
      .select(col("vec_id"), cosineSim(col("vec"), q).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0))
    assert(ivf.toSeq === brute.toSeq)
    // a keyword-pruned probe over the doomed axis never serves a
    // deleted row
    val t1 = reloaded.search(qvec, k = 1000, nprobe = 4,
      eq = Map("tag" -> Seq("t1"))).collect().map(_.getLong(0))
    assert(t1.nonEmpty && t1.forall(_ < 100L))
    // BYTE-COPY: the keyword arm confines the rewrite to tag=t1 — every
    // other tag directory travels file-for-file, byte-for-byte
    def partFiles(base: String, tag: String): Map[String, Seq[Byte]] = {
      val dir = java.nio.file.Paths.get(base, s"tag=$tag")
      val out = scala.collection.mutable.Map.empty[String, Seq[Byte]]
      java.nio.file.Files.walk(dir).forEach { p =>
        if (java.nio.file.Files.isRegularFile(p) &&
            p.getFileName.toString.contains("part-"))
          out(dir.relativize(p).toString) =
            java.nio.file.Files.readAllBytes(p).toSeq
      }
      out.toMap
    }
    Seq("t0", "t2", "t3").foreach { t =>
      val (src, cpy) = (partFiles(path, t), partFiles(dst, t))
      assert(src.nonEmpty && src.keySet === cpy.keySet,
        s"tag=$t file set changed under rotation")
      src.foreach { case (rel, bytes) =>
        assert(cpy(rel) === bytes, s"tag=$t/$rel rewrote instead of copying") }
    }
    // and the doomed directory genuinely rewrote (its survivors — the
    // sub-100 t1 ids — land in fresh files)
    assert(partFiles(dst, "t1").nonEmpty &&
      partFiles(dst, "t1").keySet != partFiles(path, "t1").keySet)
    // guards: match-all, occupied destination, same path
    intercept[IllegalArgumentException](idx.deleteTo(root + "/x", PFilter()))
    intercept[IllegalArgumentException](idx.deleteTo(dst, f))
    intercept[IllegalArgumentException](idx.deleteTo(path, f))
  }

  test("deleteTo excludes torn insertCommitted rows from the survivor rewrite") {
    import graft.api.Filters._
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("annidx-deltorn").toString
    val path = root + "/idx"
    val seed = (1L to 16L).map(i => (i, Seq((i % 4).toDouble, i / 10.0)))
      .toDF("vec_id", "vec")
    AnnIndex.build(seed, path, nlist = 2)
    val idx = AnnIndex.load(spark, path)
    idx.insertCommitted(Seq((100L, Seq(0.1, 0.1))).toDF("vec_id", "vec"), 1L)
    // craft a TORN batch-2 attempt: a b2- prefixed duplicate file in a
    // published dir plus its intent, no marker (the insertCommitted
    // torn-sweep scenario)
    def findPart(dir: java.io.File): java.io.File = {
      val es = dir.listFiles().sortBy(_.getName)
      es.find(f => f.isFile && f.getName.startsWith("part-"))
        .getOrElse(es.filter(_.isDirectory).map(findPart).head)
    }
    val torn = findPart(new java.io.File(path))
    java.nio.file.Files.copy(torn.toPath,
      torn.toPath.resolveSibling("b2-" + torn.getName))
    val tornDir = new java.io.File(path).toPath
      .relativize(torn.getParentFile.toPath).toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"${path}_meta/batches/intent-2"),
      tornDir.getBytes("UTF-8"))
    // an unprunable filter rewrites EVERY directory — the regime where
    // decoding the torn duplicate would mint it into committed rows
    val rotated = idx.deleteTo(root + "/rotated",
      PFilter(must = Seq(IntBounds("vec_id", gte = Some(9L),
        lte = Some(12L)))))
    val ids = rotated.points.select("vec_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === ((1L to 8L) ++ (13L to 16L) :+ 100L).sorted.toSeq,
      "torn rows must not become committed survivors")
    // the commit bookkeeping traveled: the intent is still pending at
    // the destination, so a re-pointed stream replays batch 2 there
    assert(new java.io.File(s"$root/rotated_meta/batches/intent-2").exists())
    assert(new java.io.File(s"$root/rotated_meta/batches/batch-1").exists())
  }

  test("imbalance audit accounts for every vector with a sane skew ratio") {
    val path = tmp("audit")
    val idx = AnnIndex.build(corpus, path, nlist = 4)
    val r = idx.imbalanceAudit().head()
    assert(r.getLong(0) === 4L)
    assert(r.getLong(1) === corpus.count())
    assert(r.getLong(2) >= r.getLong(3))
    assert(r.getDouble(4) >= 1.0 - 1e-9) // max ≥ mean always
  }
}
