package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Z-VALUE: bit-interleave two `bits`-wide non-negative integer
    * coordinates (x in the even bit positions, y in the odd) — the
    * Morton/Z-order curve key. Sorting by it clusters rows that are
    * close in BOTH dimensions, so min/max file statistics prune
    * two-dimensional predicates (tenant × time, user × hour) instead of
    * only the leading sort column. Pure codegen'd integer bit math.
    */
  def zvalue(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(1), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(1), 2 * i + 1)
    }.reduce(_ + _)

  /** Z-ORDERED table sink: quantize two layout columns to `bits`-wide
    * grid coordinates over their global bounds (exact integer
    * arithmetic), range-partition by the interleaved z-value into
    * `nFiles` files, sort within each file. The result is the
    * two-dimensional layout every lakehouse OPTIMIZE ZORDER produces:
    * each file covers a small rectangle of (x × y) space, so scans
    * filtered on EITHER or BOTH dimensions skip most files on parquet
    * min/max stats alone — at 100 TB this turns (tenant, time-range)
    * queries from full scans into a handful of file reads. The bounds
    * pass is one tiny aggregate; the write is the same single exchange
    * a plain sorted write pays.
    */
  def writeZOrdered(df: DataFrame, x: String, y: String, path: String,
                    bits: Int = 16, nFiles: Int = 64): Unit = {
    val b = df.agg(min(col(x)).cast("long").as("lx"), max(col(x)).cast("long").as("hx"),
      min(col(y)).cast("long").as("ly"), max(col(y)).cast("long").as("hy")).head()
    val (lx, hx, ly, hy) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val m = (1L << bits) - 1
    // integer-exact quantization (the *m product stays < 2^63 for any
    // realistic id/time span; `div` is integer division, no float path)
    def q(name: String, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L) else expr(s"((`$name` - ${lo}L) * ${m}L) div ${hi - lo}L")
    df.withColumn("__z", zvalue(q(x, lx, hx), q(y, ly, hy), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** TRAINING-SHARD SINK — the deterministic global shuffle a training
    * export needs: shard = md5(doc_id) (content-independent,
    * engine-portable — the same assignment
    * [[graft.operators.TextAnalysis.shardExport]] reports), written as
    * `shard=N/` parquet directories with a deterministic within-shard
    * order (md5 of doc_id again, a different hex window, so the order is
    * decorrelated from the assignment). Re-running the export on the
    * same corpus produces byte-identical shards no matter the cluster
    * size or input partitioning — the reproducibility property data-
    * parallel training needs for resumable epochs. One exchange
    * (repartition by shard), one within-partition sort; no driver state.
    */
  def writeTrainingShards(docs: DataFrame, path: String, nShards: Int = 8): Unit =
    docs
      .withColumn("shard",
        conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % nShards)
      .withColumn("__ord",
        conv(substring(md5(col("doc_id").cast("string")), 5, 12), 16, 10)
          .cast("long"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__ord"), col("doc_id"))
      .drop("__ord")
      .write.partitionBy("shard").mode("overwrite").parquet(path)

  /** SMALL-FILE COMPACTION — the maintenance job every streaming or
    * incremental sink eventually needs: a micro-batch writer (e.g.
    * writeEventsStream, upsertStream) accretes thousands of KB-sized
    * files, and at 100 TB the scan's task-per-file scheduling and
    * footer reads dominate. Rewrites a parquet directory into
    * ≈`targetBytes` files: file count = ceil(input bytes / target),
    * rows re-distributed round-robin (repartition without keys — no
    * skew, no sort), committed to a new generation directory so readers
    * of the old layout are never disturbed. Returns the new file count.
    */
  /** One dataset-layout finding. `action` ∈ ok | compact. */
  case class LayoutAudit(nFiles: Int, totalBytes: Long, nSmall: Int,
                         smallShare: Double, recTargetFiles: Int, action: String)

  /** SMALL-FILE LAYOUT AUDIT — the decision input to [[compact]]: one
    * directory listing (no data read) reporting file count, byte
    * total, how many files sit under `smallBytes`, and the target file
    * count a compaction would produce. The classic lakehouse failure
    * this catches: a streaming sink or over-parallel write leaves 10⁴
    * KB-sized parquet files, and every later scan pays 10⁴ task
    * schedules + footer reads for MBs of data. `action = "compact"`
    * when more than half the files are small AND compaction would
    * reduce the file count.
    */
  def layoutAudit(spark: SparkSession, path: String,
                  targetBytes: Long = 128L * 1024 * 1024,
                  smallBytes: Long = 16L * 1024 * 1024): LayoutAudit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getLen)
    val total = files.sum
    val nSmall = files.count(_ < smallBytes)
    val rec = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val action =
      if (files.nonEmpty && nSmall * 2 > files.length && rec < files.length) "compact"
      else "ok"
    LayoutAudit(files.length, total, nSmall,
      if (files.isEmpty) 0.0 else nSmall.toDouble / files.length, rec, action)
  }

  def compact(spark: SparkSession, path: String, outPath: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(path)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outPath)
    nFiles
  }

  /** Streaming parquet sink with checkpointed exactly-once file commits. */
  def writeEventsStream(events: DataFrame, path: String, checkpoint: String) =
    events.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
}
