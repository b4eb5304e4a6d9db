package graft

import graft.api.GraphIndex
import org.apache.spark.sql.functions._

class GraphIndexSpec extends SparkSpecBase {
  import spark.implicits._

  // clustered corpus — the regime a graph index exists for
  private lazy val (corpus, queryVecs) = {
    val rnd = new scala.util.Random(7)
    val dim = 32; val nClusters = 8; val per = 60
    val centers = Array.fill(nClusters, dim)(rnd.nextGaussian())
    def jitter(c: Array[Double]): Seq[Double] =
      c.map(v => v + 0.2 * rnd.nextGaussian()).toSeq
    val members = for (i <- 0 until per; c <- 0 until nClusters)
      yield (10L + i.toLong * nClusters + c, jitter(centers(c)), s"site${c % 3}")
    val qs = (0 until 5).map(q => jitter(centers(q)))
    (members.toDF("vec_id", "vec", "site"), qs)
  }

  private lazy val dir =
    java.nio.file.Files.createTempDirectory("graft-gidx").toString

  private lazy val built = GraphIndex.build(corpus, dir)

  private def bruteTop(q: Seq[Double], k: Int, pred: Option[String] = None): Seq[Long] = {
    val qc = array(q.map(lit): _*)
    val base = pred.fold(corpus)(p => corpus.filter(col("site") === p))
    base.select(col("vec_id"),
        graft.functions.Vectors.cosineSim(col("vec"), qc).as("cs"))
      .orderBy(col("cs").desc, col("vec_id").asc).limit(k)
      .collect().map(_.getLong(0)).toSeq
  }

  test("built index serves top-k with recall >= 0.9 vs brute force on every query") {
    val recalls = queryVecs.map { q =>
      val hits = built.search(q, k = 10).collect().map(_.getLong(1)).toSet
      val exact = bruteTop(q, 10).toSet
      (hits & exact).size.toDouble / exact.size
    }
    assert(recalls.sum / recalls.size >= 0.9, s"recalls $recalls")
  }

  test("save -> load round-trips: a reopened index returns identical results") {
    val q = queryVecs.head
    val before = built.search(q, k = 10).collect().toSeq
    val reopened = GraphIndex.load(spark, dir)
    val after = reopened.search(q, k = 10).collect().toSeq
    assert(after === before)
  }

  test("payload post-filter returns k matching rows, all from the predicate's slice") {
    val q = queryVecs.head
    val hits = built.search(q, k = 5, beam = 20, hops = 3,
      filter = Some(col("site") === "site0")).collect()
    assert(hits.length === 5)
    val ids = hits.map(_.getLong(1)).toSet
    val allowed = corpus.filter(col("site") === "site0")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(allowed), s"filter leak: ${ids -- allowed}")
    // ranked descending by cosine
    val cs = hits.sortBy(_.getLong(0)).map(_.getDouble(2)).toSeq
    assert(cs === cs.sorted.reverse)
  }

  test("searchFilter: the filter object ≡ the hand-built column post-filter") {
    import graft.api.Filters._
    val q = queryVecs.head
    val viaObj = built.searchFilter(q,
      PFilter(must = Seq(MatchValue("site", "site0"))), k = 5, beam = 20, hops = 3)
      .collect().map(_.toSeq).toSeq
    val viaCol = built.search(q, k = 5, beam = 20, hops = 3,
      filter = Some(coalesce(col("site") === "site0", lit(false))))
      .collect().map(_.toSeq).toSeq
    assert(viaObj === viaCol)
    // a composed tree (should group over two sites) honors Qdrant
    // semantics and still fills the page through the depth contract
    val f = PFilter(should = Seq(MatchValue("site", "site1"),
      MatchValue("site", "site2")))
    val hits = built.searchFilter(q, f, k = 5, beam = 20, hops = 3).collect()
    assert(hits.length === 5)
    val allowed = corpus.filter(col("site").isin("site1", "site2"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(hits.map(_.getLong(1)).forall(allowed))
    // unknown fields refuse loudly at the boundary
    intercept[IllegalArgumentException](
      built.searchFilter(q, PFilter(must = Seq(MatchValue("nope", "x"))), 5))
  }

  test("a ~1%-selective filter still returns k rows (widen, then brute fallback)") {
    // VERDICT r4 #9: post-filter + fixed oversample silently returned
    // < k on very selective filters. The depth contract: widen the
    // beam geometrically, then brute-force the filter's matching slice
    // — so the page is full (or the filter admits fewer than k total).
    val q = queryVecs.head
    val pred = col("vec_id") % 96 === 0 // 5 of the 480 corpus points
    val hits = built.search(q, k = 5, filter = Some(pred)).collect()
    assert(hits.length === 5, s"short page: ${hits.length} rows")
    val allowed = corpus.filter(pred).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(hits.map(_.getLong(1)).toSet === allowed,
      "expected the full matching slice (k == slice size here)")
    val cs = hits.sortBy(_.getLong(0)).map(_.getDouble(2)).toSeq
    assert(cs === cs.sorted.reverse)
  }

  test("searchBatch ranks every query and the corpus never shuffles in the score plan") {
    val queries = queryVecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("query_id", "qvec")
    val res = built.searchBatch(queries, k = 3)
    val rows = res.collect()
    assert(rows.groupBy(_.getLong(0)).size === queryVecs.size)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) => assert(rs.length === 3) }
    // scale guard: vectors may only move by BROADCAST (query side) —
    // any shuffle exchange carrying an ARRAY column means the corpus
    // (or candidate-attached vectors) crossed a hash/range exchange
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.ArrayType
    val offenders = res.queryExecution.sparkPlan.collect {
      case e: ShuffleExchangeExec
        if e.child.output.exists(_.dataType.isInstanceOf[ArrayType]) => e
    }
    assert(offenders.isEmpty, s"vector arrays crossed a shuffle:\n${offenders.mkString}")
  }

  test("incremental insert reaches new points, keeps recall, and never mutates the old snapshot") {
    val oldHalf = corpus.filter(col("vec_id") % 2 === 0)
    val newHalf = corpus.filter(col("vec_id") % 2 =!= 0)
    val dirA = java.nio.file.Files.createTempDirectory("graft-gidx-a").toString
    val dirB = java.nio.file.Files.createTempDirectory("graft-gidx-b").toString
    val base = GraphIndex.build(oldHalf, dirA)
    val baseBefore = base.search(queryVecs.head, k = 10).collect().toSeq
    val merged = base.insertTo(newHalf, dirB)
    // inserted points are linked into the graph: searching an inserted
    // vector's own embedding surfaces its id at the top
    newHalf.select("vec_id", "vec").collect().take(5).foreach { r =>
      val self = r.getLong(0)
      val got = merged.search(r.getSeq[Double](1), k = 3, beam = 20, hops = 3)
        .collect().map(_.getLong(1))
      assert(got.contains(self), s"inserted point $self unreachable (got ${got.toSeq})")
    }
    // recall over the FULL corpus stays index-grade on the clustered set
    val recalls = queryVecs.map { q =>
      val hits = merged.search(q, k = 10, beam = 20, hops = 3)
        .collect().map(_.getLong(1)).toSet
      val exact = bruteTop(q, 10).toSet
      (hits & exact).size.toDouble / exact.size
    }
    assert(recalls.sum / recalls.size >= 0.8, s"post-insert recalls $recalls")
    // snapshot isolation: the pre-insert index still answers identically
    assert(base.search(queryVecs.head, k = 10).collect().toSeq === baseBefore)
  }

  test("delete removes the slice from results and refreshes dead entry points") {
    val dirC = java.nio.file.Files.createTempDirectory("graft-gidx-c").toString
    val before = built.search(queryVecs.head, k = 10).collect().toSeq
    val shrunk = built.deleteTo(col("site") === "site0", dirC)
    val deleted = corpus.filter(col("site") === "site0")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    queryVecs.foreach { q =>
      val hits = shrunk.search(q, k = 10, beam = 20, hops = 3)
        .collect().map(_.getLong(1)).toSet
      assert(hits.intersect(deleted).isEmpty, s"deleted ids resurfaced: ${hits & deleted}")
      assert(hits.nonEmpty)
    }
    // no dangling edges, and every entry point survives in the corpus
    val live = spark.read.parquet(s"$dirC/vectors")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val edges = spark.read.parquet(s"$dirC/edges").collect()
    edges.foreach { e =>
      assert(live(e.getLong(0)) && live(e.getLong(1)), s"dangling edge $e")
    }
    val entries = spark.read.parquet(s"$dirC/entries").collect().map(_.getLong(0))
    assert(entries.forall(live), "entry points reference deleted nodes")
    // snapshot isolation
    assert(built.search(queryVecs.head, k = 10).collect().toSeq === before)
  }

  test("insertTo/deleteTo refuse to overwrite the open snapshot (even via an aliased path)") {
    val one = corpus.limit(1).select(col("vec_id") + 100000L as "vec_id", col("vec"))
    intercept[IllegalArgumentException] { built.insertTo(one, dir) }
    intercept[IllegalArgumentException] { built.deleteTo(col("site") === "site0", dir) }
    // trailing-slash alias resolves to the same canonical path
    intercept[IllegalArgumentException] { built.deleteTo(col("site") === "site0", dir + "/") }
  }
}
