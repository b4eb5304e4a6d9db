package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion sources and sinks for the training-data pipeline: the
  * document corpus arrives as JSONL / CSV / raw text lines, events
  * arrive as a file stream; curated outputs land as partitioned parquet.
  *
  * All readers produce the canonical `documents(doc_id, text, lang,
  * source, n_chars)` schema so every operator in graft.operators runs
  * unchanged on ingested data. Schemas are always explicit — schema
  * inference reads the data twice and infers drifting types at 100 TB.
  */
object Sources {

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true)))

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = true),
    StructField("value", DoubleType, nullable = true),
    StructField("props", StringType, nullable = true)))

  private def canonical(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("text"), col("lang"), col("source"),
      length(col("text")).cast("long").as("n_chars"))

  /** JSONL corpus: one JSON document per line. Malformed lines are
    * quarantined in `_corrupt` (PERMISSIVE) rather than failing the
    * 100 TB job; count them, don't crash on them.
    */
  def readDocumentsJsonl(spark: SparkSession, path: String): DataFrame =
    canonical(spark.read
      .schema(documentsSchema.add("_corrupt", StringType))
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      .filter(col("_corrupt").isNull))

  /** Headered CSV corpus with explicit schema (no inference pass). */
  def readDocumentsCsv(spark: SparkSession, path: String): DataFrame =
    canonical(spark.read
      .schema(documentsSchema)
      .option("header", "true").option("mode", "DROPMALFORMED")
      .csv(path))

  /** Raw text corpus: one document per line; doc_id is the stable
    * per-file line offset (deterministic under re-partitioning, unlike
    * monotonically_increasing_id whose values depend on task layout).
    */
  def readDocumentsText(spark: SparkSession, path: String,
                        lang: String = "und"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(input_file_name()).orderBy(col("__pos"))
    canonical(spark.read.text(path)
      .select(col("value").as("text"), input_file_name().as("source"))
      .withColumn("__pos", monotonically_increasing_id())
      .withColumn("doc_id", row_number().over(w).cast("long") - 1)
      .withColumn("lang", lit(lang))
      .drop("__pos"))
  }

  /** Unbounded event-file stream (the readStream face of Tables.events);
    * `maxFilesPerTrigger` bounds micro-batch size for backpressure.
    */
  def readEventsStream(spark: SparkSession, dir: String,
                       maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Curated-corpus sink: parquet partitioned by language — downstream
    * per-language jobs (langid training, per-lang dedup) prune whole
    * directories at the scan.
    */
  def writeDocumentsByLang(docs: DataFrame, path: String): Unit =
    docs.repartition(col("lang"))
      .write.partitionBy("lang").mode("overwrite").parquet(path)

  /** ORC round-trip — the alternate columnar format Spark ships with
    * (predicate pushdown + column pruning work the same as parquet).
    * Lets the engine sit on top of ORC-based lakes without conversion.
    */
  def writeDocumentsOrc(docs: DataFrame, path: String): Unit =
    docs.write.mode("overwrite").orc(path)

  def readDocumentsOrc(spark: SparkSession, path: String): DataFrame =
    canonical(spark.read.schema(documentsSchema.add("n_chars", LongType)).orc(path)
      .drop("n_chars"))

  /** Hash-bucketed table sink: parquet bucketed (and sorted) by the join
    * key. Two tables bucketed by the same key into the same bucket count
    * join WITHOUT a shuffle — the storage layout IS the exchange, paid
    * once at write time and amortized over every later join/aggregation
    * on that key. This is the 100 TB answer for the always-joined pairs
    * (orders⋈customer, points⋈tenant metadata): at 1000 executors the
    * fact-table exchange is the single most expensive stage a naive plan
    * runs, and a bucketed layout deletes it. Verified by SourcesSpec:
    * the bucketed join plan contains zero ShuffleExchange operators.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Streaming parquet sink with checkpointed exactly-once file commits. */
  def writeEventsStream(events: DataFrame, path: String, checkpoint: String) =
    events.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
}
