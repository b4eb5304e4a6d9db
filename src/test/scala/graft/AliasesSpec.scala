package graft

import graft.api.{Aliases, Tokenizer, CuratePipeline, VectorIndex}
import org.apache.spark.sql.functions._

class AliasesSpec extends SparkSpecBase {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-alias-$name")
    d.toFile.deleteOnExit(); d.toString
  }

  test("alias blue/green: set, resolve, atomic re-point, open the live index") {
    val reg = tmp("reg")
    val v1 = tmp("v1"); val v2 = tmp("v2")
    val docs = Tables.documents(spark, sf).limit(50)
      .select(col("doc_id"), col("text"), (col("doc_id") % 20).as("user_id"),
        col("source").as("site"), col("lang"))
    VectorIndex.fromTexts(docs).save(v1 + "/idx")
    VectorIndex.fromTexts(docs.withColumn("text", upper(col("text")))).save(v2 + "/idx")
    assert(Aliases.resolve(spark, reg, "prod").isEmpty)
    Aliases.set(spark, reg, "prod", v1 + "/idx")
    assert(Aliases.resolve(spark, reg, "prod") === Some(v1 + "/idx"))
    // the serving client opens through the alias
    val idx1 = Aliases.openIndex(spark, reg, "prod")
    assert(idx1.points.count() === 50)
    // blue/green: re-point at the rebuilt collection — a new committed
    // generation, the old one untouched on disk
    Aliases.set(spark, reg, "prod", v2 + "/idx")
    assert(Aliases.resolve(spark, reg, "prod") === Some(v2 + "/idx"))
    assert(Aliases.list(spark, reg) === Map("prod" -> (v2 + "/idx")))
    // an uncommitted (crashed) generation is ignored by resolve
    val fs = new org.apache.hadoop.fs.Path(reg)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val torn = new org.apache.hadoop.fs.Path(reg + "/prod/gen-000000000099")
    fs.mkdirs(torn) // no _SUCCESS
    assert(Aliases.resolve(spark, reg, "prod") === Some(v2 + "/idx"))
    // names that would escape the registry dir are rejected
    intercept[IllegalArgumentException] {
      Aliases.set(spark, reg, "../evil", "/tmp/x")
    }
  }

  test("curate reports the token budget under a persisted tokenizer") {
    val out = tmp("curated") + "/docs"
    val tok = Tokenizer.trainBpe(Tables.documents(spark, sf), nMerges = 8)
    val report = CuratePipeline.curate(spark, sf, out, tokenizer = Some(tok))
    assert(report.tokenBudget.isDefined)
    // the budget equals re-encoding the curated output with the artifact
    val curated = spark.read.parquet(out).select("doc_id", "text")
    val recount = tok.encode(curated)
      .agg(coalesce(sum("n_tokens"), lit(0L))).head().getLong(0)
    assert(report.tokenBudget.get === recount)
    assert(report.tokenBudget.get > 0)
    // without a tokenizer the field stays None (no silent extra pass)
    val r2 = CuratePipeline.curate(spark, sf, out)
    assert(r2.tokenBudget.isEmpty)
  }
}
