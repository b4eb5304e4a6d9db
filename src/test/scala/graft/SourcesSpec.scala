package graft

import graft.sources.Sources
import java.nio.file.{Files, Paths}

class SourcesSpec extends SparkSpecBase {

  private def tmpDir(name: String): String = {
    val p = Files.createTempDirectory(s"graft-$name")
    p.toFile.deleteOnExit()
    p.toString
  }

  test("JSONL documents round-trip with corrupt-line quarantine") {
    val dir = tmpDir("jsonl")
    Files.write(Paths.get(dir, "docs.jsonl"), java.util.Arrays.asList(
      """{"doc_id": 1, "text": "the fast scan", "lang": "en", "source": "web"}""",
      """{"doc_id": 2, "text": "sort merge table", "lang": "es", "source": "web"}""",
      """this is not json at all""",
      """{"doc_id": 3, "text": "join hash key", "lang": "fr", "source": "book"}"""))
    val docs = Sources.readDocumentsJsonl(spark, dir).collect()
    assert(docs.length === 3) // corrupt line dropped, not fatal
    val d1 = docs.find(_.getLong(0) == 1L).get
    assert(d1.getString(1) === "the fast scan")
    assert(d1.getLong(4) === 13L) // n_chars derived
  }

  test("CSV documents read with explicit schema") {
    val dir = tmpDir("csv")
    Files.write(Paths.get(dir, "docs.csv"), java.util.Arrays.asList(
      "doc_id,text,lang,source",
      "10,window stream batch,de,crawl",
      "11,the the the,en,crawl"))
    val docs = Sources.readDocumentsCsv(spark, dir).collect()
    assert(docs.map(_.getLong(0)).sorted.toSeq === Seq(10L, 11L))
  }

  test("text lines become documents with stable per-file ids") {
    val dir = tmpDir("txt")
    Files.write(Paths.get(dir, "corpus.txt"),
      java.util.Arrays.asList("first doc line", "second doc line", "third"))
    val a = Sources.readDocumentsText(spark, dir).collect().map(r => (r.getLong(0), r.getString(1)))
    val b = Sources.readDocumentsText(spark, dir).collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.sortBy(_._1).toSeq === b.sortBy(_._1).toSeq) // deterministic ids
    assert(a.length === 3)
    assert(a.sortBy(_._1).head._2 === "first doc line")
  }

  test("documents sink partitions by lang and operators run on ingested data") {
    val dir = tmpDir("sink")
    val docs = Tables.documents(spark, sf)
    Sources.writeDocumentsByLang(docs.select("doc_id", "text", "lang", "source", "n_chars"), dir)
    val back = spark.read.parquet(dir)
    assert(back.count() === docs.count())
    // partition pruning: a lang filter reads only that directory
    val plan = back.filter(org.apache.spark.sql.functions.col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    // the canonical schema feeds the operator suite unchanged
    val q = graft.operators.TextAnalysis.quality(spark, sf)
    assert(q.count() > 0)
  }

  test("ORC sink/source round-trips with pushdown intact") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("orc")
    val docs = Tables.documents(spark, sf)
    Sources.writeDocumentsOrc(docs, dir)
    val back = Sources.readDocumentsOrc(spark, dir)
    assert(back.count() === docs.count())
    val plan = back.filter(col("doc_id") === 7).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"), plan)
  }

  test("operators tolerate null and empty text") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val weird = Seq((1L, null.asInstanceOf[String], "en", "s"),
      (2L, "", "en", "s"), (3L, "one two three", "fr", "s"))
      .toDF("doc_id", "text", "lang", "source")
    // columnar text ops must not throw on null/empty — null rows yield
    // null metrics, empty rows yield zero-ish metrics
    val q = weird.select(col("doc_id"),
      org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.split(col("text"), " ")).as("n"))
      .collect().sortBy(_.getLong(0))
    assert(q.length === 3)
    // shingling skips null/short docs instead of crashing
    val sh = graft.operators.Dedup.shingleRows(weird, w = 2, distinct = false)
      .collect().map(_.getLong(0)).distinct.sorted
    assert(sh.toSeq === Seq(3L))
  }

  test("bucketed tables join with zero shuffle exchanges") {
    import org.apache.spark.sql.functions.col
    Sources.writeBucketed(Tables.orders(spark, sf), "orders_b", "o_custkey", 4)
    Sources.writeBucketed(Tables.customer(spark, sf), "customer_b", "c_custkey", 4)
    // force the shuffle-based strategy: broadcast would mask bucketing
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      val expected = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() === expected)
      // and a key-grouped aggregation over one bucketed table: no exchange
      val agg = spark.table("orders_b").groupBy("o_custkey").count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("layoutAudit flags fragmentation, passes the compacted layout, reads no data") {
    val frag = tmpDir("audit-frag"); val out = tmpDir("audit-out")
    Tables.events(spark, sf).repartition(64).write.mode("overwrite").parquet(frag)
    val before = Sources.layoutAudit(spark, frag, targetBytes = 512L * 1024)
    assert(before.nFiles === 64)
    assert(before.nSmall === 64 && before.smallShare === 1.0)
    assert(before.action === "compact")
    assert(before.recTargetFiles < before.nFiles)
    Sources.compact(spark, frag, out, targetBytes = 512L * 1024)
    val after = Sources.layoutAudit(spark, out, targetBytes = 512L * 1024)
    // compaction hits the audit's own recommendation and clears the flag
    assert(after.nFiles === before.recTargetFiles)
    assert(after.action === "ok")
    // totals conserved (same rows, same-ish encoding)
    assert(after.totalBytes > 0 && before.totalBytes > 0)
    // empty dir handled
    val empty = tmpDir("audit-empty")
    val e = Sources.layoutAudit(spark, empty)
    assert(e.nFiles === 0 && e.action === "ok" && e.smallShare === 0.0)
  }

  test("compaction rewrites a fragmented directory into few files, data intact") {
    import org.apache.spark.sql.functions.col
    val frag = tmpDir("frag"); val out = tmpDir("compacted")
    // simulate a micro-batch sink: 64 tiny files
    Tables.events(spark, sf).repartition(64).write.mode("overwrite").parquet(frag)
    val beforeFiles = new java.io.File(frag).listFiles().count(_.getName.endsWith(".parquet"))
    assert(beforeFiles === 64)
    Sources.compact(spark, frag, out, targetBytes = 512L * 1024)
    val afterFiles = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(afterFiles < beforeFiles / 4, s"still fragmented: $afterFiles files")
    // nothing lost, nothing duplicated
    val a = spark.read.parquet(out).select("event_id").collect().map(_.getLong(0)).sorted
    val b = Tables.events(spark, sf).select("event_id").collect().map(_.getLong(0)).sorted
    assert(a.toSeq === b.toSeq)
  }

  test("training shards are complete, assignment-consistent, and byte-deterministic") {
    import org.apache.spark.sql.functions._
    val d1 = tmpDir("shards1"); val d2 = tmpDir("shards2")
    val docs = Tables.documents(spark, sf)
    Sources.writeTrainingShards(docs, d1)
    Sources.writeTrainingShards(docs, d2)
    val back = spark.read.parquet(d1)
    // nothing lost, nothing duplicated
    assert(back.select("doc_id").distinct().count() === docs.count())
    assert(back.count() === docs.count())
    // the layout's shard matches the operator's portable hash assignment
    val fromLayout = back.groupBy("shard").agg(count(lit(1)).as("n_docs"))
      .collect().map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    val fromOp = graft.operators.TextAnalysis.shardExport(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromLayout === fromOp)
    // reproducibility: same corpus -> byte-identical shard files
    def bytesBySuffix(dir: String): Map[String, Long] =
      new java.io.File(dir).listFiles().filter(_.isDirectory).flatMap { sd =>
        sd.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => s"${sd.getName}" -> f.length())
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(bytesBySuffix(d1) === bytesBySuffix(d2))
    // within-shard order is deterministic too (row-order compare)
    val o1 = spark.read.parquet(d1 + "/shard=3").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val o2 = spark.read.parquet(d2 + "/shard=3").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(o1 === o2 && o1.nonEmpty)
  }

  test("z-ordered layout bounds BOTH dimensions per file (2-D locality)") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("zorder")
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        expr("unix_micros(ts) div 3600000000").as("hr"))
    Sources.writeZOrdered(ev, "user_id", "hr", dir, nFiles = 16)
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg((max("user_id") - min("user_id")).as("su"), (max("hr") - min("hr")).as("sh"))
      .collect()
    val g = ev.agg(max("user_id") - min("user_id"), max("hr") - min("hr")).head()
    val (gu, gh) = (g.getLong(0).toDouble, g.getLong(1).toDouble)
    val avgU = perFile.map(_.getLong(1)).sum.toDouble / perFile.length / gu
    val avgH = perFile.map(_.getLong(2)).sum.toDouble / perFile.length / gh
    // a single-column sort bounds one dimension and leaves the other at
    // ~full span; the z-order layout must shrink BOTH well below it
    assert(avgU <= 0.6 && avgH <= 0.6, s"poor 2-D locality: u=$avgU h=$avgH")
    // row fidelity: nothing lost or duplicated by the layout write
    assert(spark.read.parquet(dir).count() === ev.count())
  }
}
