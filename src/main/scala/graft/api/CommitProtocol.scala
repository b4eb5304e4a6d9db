package graft.api

import org.apache.hadoop.fs.{FileSystem, Path}

/** EXACTLY-ONCE publish protocol for append-in-place partitioned
  * layouts — the intent/marker discipline factored out of
  * [[PayloadIndex!.insertCommitted]] (where it was proven under the
  * torn-attempt specs) so every maintained index ([[PayloadIndex]],
  * [[AnnIndex]]) shares ONE implementation of the invariants instead
  * of re-deriving them per layout. The reference outsources this
  * entirely (Qdrant's WAL gives its upserts idempotence,
  * /root/reference/insert.py:60-75 retries blindly); a lakehouse
  * layout has no WAL, so the protocol IS the index's crash story.
  *
  * Protocol per (layout, batchId), in order:
  *
  *  1. COMMITTED-BATCH SKIP: the `batches/batch-N` marker exists →
  *     no-op (monotone checkpoint batchIds).
  *  2. TORN-ATTEMPT SWEEP: delete every `bN-*` file in the directories
  *     the crashed attempt's `batches/intent-N` file lists — file names
  *     CARRY the batch id precisely so a crashed previous attempt is
  *     identifiable and removable (plain appends are not), and the
  *     intent (written after staging, BEFORE the first rename) bounds
  *     where such files can be, so the sweep never lists the whole
  *     layout: at 100 TB the data tree holds every partition directory
  *     ever written, and a full recursive listing per micro-batch would
  *     dwarf the batch itself. No intent ⇒ nothing was ever published ⇒
  *     nothing to sweep — the clean path pays one existence check.
  *     ("No intent ⇒ nothing published" is an invariant of THIS writer:
  *     torn state left by a pre-protocol writer has prefixed files and
  *     no intent — sweep such a layout once, manually, before resuming
  *     its stream under this version.)
  *  3. the caller STAGES the batch fully (ordinary parquet jobs into a
  *     staging tree), then [[publish]] commits the staged directory
  *     list as the intent and MOVES the staged part files in as `bN-`
  *     prefixed files (same-filesystem renames).
  *  4. the marker commits LAST — it exists only above a fully-moved
  *     batch, so replay after a crash at ANY point converges to exactly
  *     one copy of every row. The intent retires after the marker (a
  *     crash between the two leaves a stale intent the marker skip
  *     never reads — one orphaned KB, never a wrong sweep: batch ids
  *     are never reused).
  *
  * `metaRoot` holds the `batches/` bookkeeping; `dataRoot` anchors the
  * intent's dest-relative directory names (the two coincide for
  * [[PayloadIndex]]; [[AnnIndex]]'s flat layout keeps bookkeeping
  * beside the data tree so a plain `spark.read.parquet(layout)` never
  * sees it).
  */
private[graft] object CommitProtocol {

  private def marker(metaRoot: String, batchId: Long) =
    new Path(s"$metaRoot/batches/batch-$batchId")
  private def intent(metaRoot: String, batchId: Long) =
    new Path(s"$metaRoot/batches/intent-$batchId")
  def prefix(batchId: Long): String = s"b$batchId-"

  /** Step 1: the replay skip. */
  def isCommitted(fs: FileSystem, metaRoot: String, batchId: Long): Boolean =
    fs.exists(marker(metaRoot, batchId))

  /** Step 2: sweep a torn previous attempt of this batch — only in the
    * directories its intent names.
    */
  def sweepTorn(fs: FileSystem, metaRoot: String, dataRoot: String,
                batchId: Long): Unit =
    readIntent(fs, intent(metaRoot, batchId)).foreach(rel =>
      sweepPrefixed(fs, new Path(dataRoot, rel), prefix(batchId)))

  /** Steps 3-4: commit the intent (every dest-relative directory about
    * to receive a prefixed file, computed from the KB-scale staging
    * trees — never the destination layout), rename the staged part
    * files in, then the marker; retire the intent last. `moves` pairs
    * each staged subtree with its `dataRoot`-relative destination
    * ("" = the root itself).
    */
  def publish(fs: FileSystem, metaRoot: String, dataRoot: String,
              batchId: Long, moves: Seq[(Path, String)]): Unit = {
    val published = moves.flatMap { case (staged, destRel) =>
      partFileDirs(fs, staged).map { rel =>
        Seq(destRel, rel).filter(_.nonEmpty).mkString("/")
      }
    }.distinct
    writeIntent(fs, intent(metaRoot, batchId), published)
    moves.foreach { case (staged, destRel) =>
      moveIn(fs, staged,
        if (destRel.isEmpty) new Path(dataRoot) else new Path(dataRoot, destRel),
        prefix(batchId))
    }
    val m = marker(metaRoot, batchId)
    fs.mkdirs(m.getParent)
    fs.create(m, false).close()
    fs.delete(intent(metaRoot, batchId), false)
  }

  /** Recursively move a staged write's part files into `dest`,
    * mirroring partition subdirectories and prefixing each file name
    * (same-filesystem renames). `_SUCCESS`/metadata files stay behind.
    */
  def moveIn(fs: FileSystem, staged: Path, dest: Path, prefix: String): Unit =
    if (fs.exists(staged)) fs.listStatus(staged).foreach { st =>
      if (st.isDirectory) moveIn(fs, st.getPath, new Path(dest, st.getPath.getName), prefix)
      else if (st.getPath.getName.startsWith("part-")) {
        fs.mkdirs(dest)
        val target = new Path(dest, prefix + st.getPath.getName)
        // a silently-failed rename followed by the marker commit would
        // LOSE the file's rows forever (the marker asserts "fully
        // moved") — fail the batch instead; the replay sweeps and
        // re-publishes
        require(fs.rename(st.getPath, target),
          s"rename ${st.getPath} -> $target failed — aborting the batch " +
            "publish (replay will sweep and retry)")
      }
    }

  /** One small driver-side metadata file (schema DDL, id column,
    * publish intents, layout options) — the shared read/write pair, so
    * the open/readAllBytes/close idiom lives once.
    */
  def writeSmallFile(fs: FileSystem, p: Path, content: String,
                     overwrite: Boolean = false): Unit = {
    fs.mkdirs(p.getParent)
    val out = fs.create(p, overwrite)
    out.write(content.getBytes("UTF-8")); out.close()
  }

  def readSmallFile(fs: FileSystem, p: Path): Option[String] =
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8")) finally in.close()
    }

  /** The publish-intent file: one dest-relative directory per line —
    * every directory the attempt is about to move a prefixed file into.
    * Overwrites (a swept previous attempt's intent may still exist).
    * Names pass through VERBATIM — no trimming: a partition value with
    * leading/trailing whitespace survives Spark's partition-path
    * escaping as a literal space in the directory name, and a trimmed
    * intent line would name a directory that does not exist, silently
    * skipping its sweep. Only fully-empty lines (the writer never
    * produces one mid-file) are dropped.
    */
  private def writeIntent(fs: FileSystem, p: Path, dirs: Seq[String]): Unit =
    writeSmallFile(fs, p, dirs.mkString("\n"), overwrite = true)

  private def readIntent(fs: FileSystem, p: Path): Seq[String] =
    readSmallFile(fs, p).toSeq
      .flatMap(_.split("\n").toSeq).filter(_.nonEmpty)

  /** The dest-relative directories of a staged write that hold part
    * files (partition subpaths; "" for an unpartitioned flat write) —
    * the intent's directory list, collected from the KB-scale staging
    * tree, never the destination layout.
    */
  def partFileDirs(fs: FileSystem, base: Path): Seq[String] = {
    def walk(p: Path, rel: String): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory)
          walk(st.getPath,
            if (rel.isEmpty) st.getPath.getName else s"$rel/${st.getPath.getName}")
        else if (st.getPath.getName.startsWith("part-")) Seq(rel)
        else Nil
      }
    if (!fs.exists(base)) Nil else walk(base, "").distinct
  }

  /** Recursively delete every file under `dir` whose name carries
    * `prefix` — the torn-attempt sweep, scoped to the crashed
    * attempt's intent directories (only a publisher writes prefixed
    * names).
    */
  def sweepPrefixed(fs: FileSystem, dir: Path, prefix: String): Unit =
    if (fs.exists(dir)) fs.listStatus(dir).foreach { st =>
      if (st.isDirectory) sweepPrefixed(fs, st.getPath, prefix)
      else if (st.getPath.getName.startsWith(prefix)) fs.delete(st.getPath, false)
    }
}
