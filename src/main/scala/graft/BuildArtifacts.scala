package graft

import org.apache.spark.sql.SparkSession

/** One-shot artifact builder: trains the Word2Vec encoder on a corpus
  * snapshot and persists it as the tracked serving artifact
  * ([[graft.operators.VectorStore.w2vEmbedder]] loads it when its
  * corpus fingerprint matches — the train-once/serve-forever
  * discipline; QdrantCloud.py:20-22's pretrained-encoder role in batch
  * form). Deterministic end-to-end (pinned seed + single-partition
  * fit), so regenerating over unchanged data is a byte-stable no-op.
  *
  * Usage: runMain graft.BuildArtifacts <sfDir> [artifactsRoot]
  *   e.g. runMain graft.BuildArtifacts /root/testdata/sf0.1 artifacts/w2v
  */
object BuildArtifacts {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outRoot = if (args.length > 1) args(1) else "artifacts/w2v"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the SAME dir naming the serving path resolves (basename +
    // corpus-fingerprint hash — see VectorStore.w2vArtifactDir)
    val fp = operators.VectorStore.w2vCorpusFingerprint(spark, sfDir)
    val dir = operators.VectorStore.w2vArtifactDir(outRoot, sfDir, fp)
    // rebuild tool: replace wholesale (the serving path only ever READS)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    if (dir.exists()) rm(dir)
    dir.mkdirs()
    val enc = graft.api.Word2VecEmbedder.train(
      Tables.documents(spark, sfDir).select("doc_id", "text"))
    enc.save(new java.io.File(dir, "vectors").toString)
    java.nio.file.Files.write(new java.io.File(dir, "corpus.fp").toPath,
      fp.getBytes("UTF-8"))
    println(s"[artifacts] w2v for $sfDir -> $dir (corpus.fp $fp, " +
      s"${enc.wordVectors.count()} words)")
    spark.stop()
  }
}
