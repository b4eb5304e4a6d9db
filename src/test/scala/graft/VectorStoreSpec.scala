package graft

import graft.operators.VectorStore
import org.apache.spark.sql.functions._

class VectorStoreSpec extends SparkSpecBase {

  test("upsertLatest keeps exactly one row per id, preferring v2") {
    val r = VectorStore.upsertLatest(spark, sf)
    val n = Tables.points(spark, sf).count()
    assert(r.count() === n)
    // every id % 5 == 0 must carry the updated seq and 2 versions
    val updated = r.filter(col("id") % 5 === 0)
    assert(updated.filter(col("seq") < 1000000).count() === 0)
    assert(updated.filter(col("n_versions") =!= 2).count() === 0)
    assert(r.filter(col("id") % 5 === 0).filter(col("head") =!= "v2").count() === 0)
  }

  test("searchTopK returns k ranked rows within the tenant") {
    val r = VectorStore.searchTopK(spark, sf).collect()
    assert(r.length === 5)
    assert(r.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    // scores ascending (euclidean, nearest first)
    val scores = r.map(_.getDouble(3)).toSeq
    assert(scores === scores.sorted)
  }

  test("searchBatch restricts results to the query's tenant and excludes self") {
    val pts = Tables.points(spark, sf)
      .select(col("id"), col("user_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    VectorStore.searchBatch(spark, sf).collect().foreach { row =>
      val (q, id) = (row.getLong(0), row.getLong(2))
      assert(q !== id)
      assert(pts(q) === pts(id))
    }
  }

  test("deleteByWord removes only matching docs of the tenant") {
    val survivors = VectorStore.deleteByWord(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val t3 = Tables.points(spark, sf).filter(col("user_id") === 3)
    val expected = t3.filter(!col("text").contains("batch"))
      .collect().map(_.getLong(0)).toSet
    assert(survivors === expected)
  }

  test("setPayload patches exactly the named ids and passes everything else through") {
    val r = VectorStore.setPayload(spark, sf).cache()
    val pts = Tables.points(spark, sf)
    assert(r.count() === pts.count())
    // patched rows carry the new fields
    assert(r.filter(col("id") % 7 === 0)
      .filter(col("site") =!= "curated" || col("lang") =!= upper(col("lang")))
      .count() === 0)
    // unpatched rows are byte-identical on the payload fields
    val orig = pts.select(col("id"), col("site").as("o_site"), col("lang").as("o_lang"))
    assert(r.filter(col("id") % 7 =!= 0).join(orig, "id")
      .filter(col("site") =!= col("o_site") || col("lang") =!= col("o_lang"))
      .count() === 0)
    r.unpersist()
    ()
  }

  test("distanceMatrix ranks k symmetric neighbors per sample member") {
    val r = VectorStore.distanceMatrix(spark, sf).cache()
    assert(r.select("a_id").distinct().count() === 20)
    assert(r.groupBy("a_id").count().filter(col("count") =!= 5).count() === 0)
    // per member: ranks are 1..k with cosine non-increasing in rank
    r.collect().groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(3))
      assert(byRank.map(_.getLong(3)).toSeq === (1L to 5L))
      val cos = byRank.map(_.getDouble(2)).toSeq
      assert(cos === cos.sorted.reverse)
    }
    // cosine is symmetric: mirrored pairs present in the cut agree exactly
    val scores = r.collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
    scores.foreach { case ((a, b), c) =>
      scores.get((b, a)).foreach(c2 => assert(c === c2))
    }
    r.unpersist()
    ()
  }

  test("discover matches a driver-side context-pair brute force") {
    val pts = Tables.points(spark, sf).select(col("id"), col("vector"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    def r4(x: Double): Double = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = pts.keys.filterNot(Set(0L, 1L, 2L, 3L, 4L)).toSeq
      .map { id =>
        val v = pts(id)
        val ctx = math.min(0.0, r4(cos(v, pts(1L))) - r4(cos(v, pts(2L)))) +
          math.min(0.0, r4(cos(v, pts(3L))) - r4(cos(v, pts(4L))))
        (id, r4(ctx), r4(cos(v, pts(0L))))
      }
      .sortBy { case (id, c, t) => (-c, -t, id) }.take(10)
    val got = VectorStore.discover(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got === expected)
  }

  test("recommendBestScore matches a driver-side best-score brute force") {
    val pts = Tables.points(spark, sf).select(col("id"), col("vector"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    def r4(x: Double): Double = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (pos, neg) = (Seq(1L, 2L, 3L, 4L, 5L), Seq(6L, 7L, 8L))
    val ex = (pos ++ neg).toSet
    val expected = pts.keys.filterNot(ex).toSeq
      .map { id =>
        val bp = pos.map(p => r4(cos(pts(id), pts(p)))).max
        val bn = neg.map(n => r4(cos(pts(id), pts(n)))).max
        (id, if (bp > bn) bp else -(bn * bn))
      }
      .sortBy { case (id, s) => (-s, id) }.take(10)
      .zipWithIndex.map { case ((id, s), i) => (i + 1L, id, s) }
    val got = VectorStore.recommendBestScore(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expected)
    // the formula's ordering property: any candidate on the positive
    // side (bp > bn) outranks every negative-side candidate
    val scores = got.map(_._3)
    assert(scores === scores.sorted.reverse)
  }

  test("searchMatchText enforces whole-word conjunctive match, ranked by cosine") {
    val texts = Tables.points(spark, sf).select(col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = VectorStore.searchMatchText(spark, sf, terms = Seq("the", "data"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val words = texts(r.getLong(1)).split(" ").toSet
      assert(words.contains("the") && words.contains("data"),
        s"id ${r.getLong(1)} missing a required word")
    }
    val scores = got.map(_.getDouble(2)).toSeq
    assert(scores === scores.sorted.reverse)
    // whole-word: a doc containing only 'database' must NOT qualify
    val idsWithDataOnlyAsPrefix = texts.collect {
      case (id, t) if t.contains("data") && !t.split(" ").contains("data") => id
    }.toSet
    assert(got.map(_.getLong(1)).forall(!idsWithDataOnlyAsPrefix.contains(_)))
  }

  test("batchOps applies the operation list in order (delete removes upserts)") {
    val got = VectorStore.batchOps(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // tenant 4 is deleted AFTER the upsert — absent entirely
    assert(!got.contains(4L))
    // every surviving id % 7 == 0 point carries the upserted seq bump
    val nPts = Tables.points(spark, sf).count()
    assert(got.values.map(_._1).sum === Tables.points(spark, sf)
      .filter(col("user_id") =!= 4).count())
    got.foreach { case (u, (_, maxSeq, _, nUp)) =>
      // any tenant owning an id % 7 == 0 point must show the seq bump
      val owns = Tables.points(spark, sf)
        .filter(col("user_id") === u && col("id") % 7 === 0).count()
      if (owns > 0) {
        assert(maxSeq >= 1000000L, s"tenant $u lost its upsert bump")
        assert(nUp === owns, s"tenant $u upsert count $nUp != $owns")
      }
    }
    assert(nPts > 0)
  }

  test("classifyNearest assigns every vector a label") {
    val r = VectorStore.classifyNearest(spark, sf)
    assert(r.count() === Tables.embeddings(spark, sf).count())
    assert(r.select("pred_label").distinct().count() <= 10)
  }

  test("textSearch round-trips: every query text retrieves its own doc at rank 1") {
    val r = VectorStore.textSearch(spark, sf).filter(col("rank") === 1).collect()
    assert(r.length === 5)
    r.foreach { row =>
      assert(row.getLong(0) === row.getLong(2)) // query_id == doc_id
      assert(row.getDouble(3) === 1.0)          // cosine with itself
    }
  }

  test("multivec maxsim equals the brute-force late-interaction recompute") {
    val tokens = 4
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val byDoc = vecs.groupBy(_._1 / tokens).view.mapValues(_.values.toSeq).toMap
    val qt = byDoc(0L)
    val expected = byDoc.filter(_._1 != 0L).map { case (doc, dts) =>
      doc -> qt.map(q => dts.map(t => cos(q, t)).max).map(m => math.rint(m * 1e6) / 1e6).sum
    }
    VectorStore.multivecMaxSim(spark, sf).collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - expected(r.getLong(0))) < 1e-3,
        s"doc ${r.getLong(0)}")
    }
  }

  test("sparse search scores equal the brute-force tf-idf dot product") {
    val docs = Tables.documents(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val n = docs.size
    val tf = docs.map { case (id, ws) => id -> ws.groupBy(identity).view.mapValues(_.size).toMap }
    val df = tf.values.flatMap(_.keys).groupBy(identity).view.mapValues(_.size).toMap
    def w(c: Int, t: String): Double =
      math.rint(c * math.log((n + 1.0) / (df(t) + 1.0)) * 1e6) / 1e6
    val q = tf(0L).map { case (t, c) => t -> w(c, t) }
    val r = VectorStore.sparseSearch(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val d = tf(row.getLong(0))
      val score = q.collect { case (t, qw) if d.contains(t) =>
        math.rint(w(d(t), t) * qw * 1e6) / 1e6 }.sum
      assert(math.abs(row.getDouble(1) - score) < 1e-3, s"doc ${row.getLong(0)}")
    }
  }

  test("mmrSearch equals the in-Scala greedy MMR over the same candidates, and diversifies") {
    import org.apache.spark.sql.functions._
    import graft.functions.Vectors.{cosineSim, toDouble}
    val k = 10; val depth = 100; val lambda = 0.7
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    // independent candidate set: brute top-depth by cosine to query 0
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("doc_id"), toDouble(col("embedding")).as("vec"))
    val q = emb.filter(col("doc_id") === 0).select(col("vec").as("qvec"))
    val cands = emb.filter(col("doc_id") =!= 0).crossJoin(broadcast(q))
      .withColumn("rel", cosineSim(col("vec"), col("qvec")))
      .orderBy(col("rel").desc, col("doc_id").asc).limit(depth)
      .select(col("doc_id"), col("vec"), col("rel"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
    // reference greedy
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Double])]
    val expected = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (expected.length < k) {
      val best = cands.filter(c => !expected.contains(c._1)).map { case (id, v, rel) =>
        val mmr = if (picked.isEmpty) rel
          else lambda * rel - (1 - lambda) * picked.map(p => cos(v, p._2)).max
        (id, v, mmr)
      }.minBy { case (id, _, mmr) => (-mmr, id) }
      picked += ((best._1, best._2)); expected += best._1
    }
    val got = VectorStore.mmrSearch(spark, sf, k, depth, lambda).collect()
    assert(got.map(_.getLong(1)).toSeq === expected.toSeq)
    // first pick is the pure-relevance top-1
    assert(got.head.getLong(1) === cands.minBy(c => (-c._3, c._1))._1)
    // diversity: the MMR set is no more self-similar than plain top-k
    val byId = cands.map(c => c._1 -> c._2).toMap
    def meanPairSim(ids: Seq[Long]): Double = {
      val ps = for (i <- ids.indices; j <- i + 1 until ids.length)
        yield cos(byId(ids(i)), byId(ids(j)))
      ps.sum / ps.length
    }
    val topkIds = cands.sortBy(c => (-c._3, c._1)).take(k).map(_._1).toSeq
    assert(meanPairSim(expected.toSeq) <= meanPairSim(topkIds) + 1e-12)
  }

  test("geoSearch only returns in-box points ranked by cosine") {
    val r = VectorStore.geoSearch(spark, sf).collect()
    assert(r.nonEmpty && r.length <= 10)
    r.foreach { row =>
      assert(row.getDouble(2) >= 10.0 && row.getDouble(2) <= 60.0)  // lat
      assert(row.getDouble(3) >= -30.0 && row.getDouble(3) <= 40.0) // lon
    }
    val scores = r.map(_.getDouble(4)).toSeq
    assert(scores === scores.sorted.reverse)
    assert(r.map(_.getLong(0)).toSeq === (1L to r.length).toSeq)
  }

  test("embedText produces deterministic unit vectors") {
    val a = VectorStore.embedText(spark, sf).limit(5).collect()
    val b = VectorStore.embedText(spark, sf).limit(5).collect()
    assert(a.map(_.getSeq[Double](1)).toSeq === b.map(_.getSeq[Double](1)).toSeq)
    a.foreach { r =>
      val v = r.getSeq[Double](1)
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9)
      assert(v.length === 64)
    }
  }

  test("searchGroupsLookup attaches exactly each group's lowest-id profile record") {
    val rows = VectorStore.searchGroupsLookup(spark, sf).collect()
    val plain = VectorStore.searchGroups(spark, sf).collect()
    assert(rows.length === plain.length)
    // group results identical to the plain group search
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(4), r.getLong(5))).toSeq ===
      plain.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq)
    // the looked-up record is the site's min id
    val minId = Tables.points(spark, sf).groupBy("site")
      .agg(min("id").as("m")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(2) === minId(r.getString(1))))
  }

  test("countPoints matches a direct filtered count per tenant") {
    val rows = VectorStore.countPoints(spark, sf).collect()
    val direct = Tables.points(spark, sf)
      .filter(col("lang").isin("en", "fr") && col("site") =!= "src0")
    assert(rows.map(_.getLong(1)).sum === direct.count())
    rows.foreach(r => assert(r.getLong(2) >= 1L && r.getLong(2) <= r.getLong(1)))
  }

  test("retrievePoints returns exactly the existing requested ids, missing ids absent") {
    val rows = VectorStore.retrievePoints(spark, sf).collect()
    val got = rows.map(_.getLong(0)).toSeq
    assert(got === Seq(3L, 17L, 42L, 250L), s"got $got") // 99999999 silently absent
    // payload passthrough + 4-dim head slice
    val p42 = Tables.points(spark, sf).filter(col("id") === 42).head()
    val r42 = rows.find(_.getLong(0) == 42L).get
    assert(r42.getString(2) === p42.getString(4)) // site column
    // mirror Spark round(): BigDecimal.valueOf (shortest decimal repr),
    // not the exact binary expansion
    val head = p42.getSeq[Double](1).take(4)
      .map(v => BigDecimal(java.math.BigDecimal.valueOf(v))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert((5 until 9).map(r42.getDouble) === head)
  }

  test("recommendLookup ranks by the centroid-difference direction, excluding nothing") {
    val r = VectorStore.recommendLookup(spark, sf).collect()
    assert(r.length === 10)
    assert(r.map(_.getLong(0)).toSeq === (1L to 10L).toSeq)
    // driver reference: exact centroid lookup + weighted difference + cosine rank
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(row => (row.getLong(0), row.getSeq[Float](1).map(_.toDouble).toArray,
        row.getInt(2)))
    val dim = emb.head._2.length
    def centroid(l: Int): Array[Double] = {
      val vs = emb.filter(_._3 == l).map(_._2)
      // mirror the operator: DECIMAL sum cast double, then / n
      Array.tabulate(dim) { i =>
        (vs.map(v => BigDecimal(v(i)).setScale(10, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble) / vs.length
      }
    }
    val (c1, c2, c3) = (centroid(1), centroid(2), centroid(3))
    val qv = Array.tabulate(dim)(i => 1 * (c1(i) + c2(i)) - 2 * c3(i))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (dd, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { dd += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dd / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = emb.map { case (id, v, _) => (id, cos(v, qv)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSeq
    assert(r.map(_.getLong(1)).toSeq === expected)
  }

  test("searchMatchPhrase requires adjacency: results are a subset of matchText's") {
    val phrase = VectorStore.searchMatchPhrase(spark, sf, k = 1000).collect()
    assert(phrase.nonEmpty)
    // every hit really contains the adjacent phrase
    val texts = Tables.points(spark, sf).select(col("id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    phrase.foreach { r =>
      assert((" " + texts(r.getLong(1)) + " ").contains(" the data "))
    }
    // conjunctive word match admits everything the phrase match does
    val loose = VectorStore.searchMatchText(spark, sf, k = 1000).collect()
      .map(_.getLong(1)).toSet
    assert(phrase.map(_.getLong(1)).toSet.subsetOf(loose))
    // and strictly more, on this corpus (words co-occur out of order)
    assert(loose.size > phrase.length)
  }

  test("deletePayloadKeys clears whole payloads for id%11 and lang for src3") {
    val r = VectorStore.deletePayloadKeys(spark, sf).cache()
    val pts = Tables.points(spark, sf)
    assert(r.count() === pts.count())
    assert(r.filter(col("id") % 11 === 0)
      .filter(col("site").isNotNull || col("lang").isNotNull).count() === 0)
    // src3 (not cleared) keeps site, loses lang
    val src3 = Tables.points(spark, sf)
      .filter(col("site") === "src3" && col("id") % 11 =!= 0)
      .select("id").collect().map(_.getLong(0)).toSet
    r.filter(col("id").isin(src3.toSeq.map(Long.box): _*)).collect().foreach { row =>
      assert(row.getString(2) === "src3")
      assert(row.isNullAt(3))
    }
    // untouched rows are byte-identical on payload fields
    val orig = pts.select(col("id"), col("site").as("o_site"), col("lang").as("o_lang"))
    assert(r.filter(col("id") % 11 =!= 0 && col("site") =!= "src3")
      .join(orig, "id")
      .filter(col("site") =!= col("o_site") || col("lang") =!= col("o_lang"))
      .count() === 0)
  }

  test("payloadIndexPlan types the integer field and sizes cardinality correctly") {
    val rows = VectorStore.payloadIndexPlan(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("lang", "site", "user_id"))
    val byField = rows.map(r => r.getString(0) -> r).toMap
    assert(byField("user_id").getString(5) === "integer")
    assert(byField("user_id").getLong(2) === 20) // id % 20 tenants
    // site/lang are non-numeric low-cardinality tags
    Seq("site", "lang").foreach { f =>
      assert(byField(f).getString(5) === "keyword")
      assert(byField(f).getLong(2) <= 64)
    }
    val n = Tables.points(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(1) === n)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
  }
}
