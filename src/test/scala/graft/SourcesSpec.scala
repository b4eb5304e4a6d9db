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
}
