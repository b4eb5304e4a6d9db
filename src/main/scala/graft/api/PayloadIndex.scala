package graft.api

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** PERSISTED PAYLOAD-FIELD INDEX — the batch analogue of Qdrant's
  * `create_payload_index` (REQUIRED before efficient payload-filtered
  * search; the reference filters every /search call on site/lang,
  * /root/reference/search.py:31-49). Without it a 1%-selective `site`
  * filter still reads every row group of a 100 TB collection; with it
  * the filter becomes DIRECTORY PRUNING at the scan.
  *
  * The index is not a secondary postings structure but a LAYOUT — the
  * [[graft.sources.Sources.writeBucketed]] philosophy: pay one
  * re-organization at build time, and the storage layout IS the index
  * for every later query, with no join to reconcile. ONE copy of the
  * data serves every indexed field:
  *
  *  - **keyword** fields (low-cardinality tags — the advisor's
  *    ≤64-distinct criterion, [[graft.operators.VectorStore.payloadIndexPlan]])
  *    become Hive partition columns: `data/site=X/lang=Y/…`. Spark
  *    prunes on ANY partition column independently, not just a prefix,
  *    so each keyword field filters to its matching directories alone.
  *    The advisor's cardinality bound is what keeps the directory
  *    count (∏ distinct) sane — indexing a high-cardinality field as
  *    `keyword` is refused by no one but the operator who ignored the
  *    advisor's `text`/`skip` verdict.
  *  - **integer** fields become MIN/MAX-ZONED buckets: values are
  *    split at build-time percentile boundaries into `nZones` zones,
  *    the zone id is one more partition column (`__zone_user_id=K`),
  *    and the manifest records each zone's exact [min, max]. A range
  *    (or equality) predicate consults the manifest — driver-side,
  *    KBs — and reads only overlapping zone directories; the raw field
  *    stays a DATA column sorted within each file, so parquet row-group
  *    min/max statistics prune a second time inside each zone.
  *  - **text** fields (Qdrant `create_payload_index(field_schema=
  *    "text")` — the advisor's high-cardinality-string verdict, and
  *    the index behind MatchText and the reference's word/regex
  *    deletes, app.py:94-139) get a TOKEN-POSTINGS sub-root
  *    (`text_<field>/`, the [[HybridIndex]] postings layout): (token,
  *    row id) pairs, token-partitioned and sorted, so a MatchText
  *    predicate reads only its terms' posting lists and gates the data
  *    scan through a candidate-id semi-join — never a corpus-wide
  *    substring scan. The field itself stays a data column; a residual
  *    whole-word (or caller regex) predicate re-verifies candidates,
  *    so the postings only ever PRUNE. Rows are named by `idCol`.
  *
  * Scale shape: build = one exact-percentile aggregate per integer
  * field + one partitioned rewrite (the same single exchange any
  * partitioned sink pays); query = directory listing + pruned scan.
  * The artifact is self-describing (schema DDL + field kinds + zone
  * map persisted beside the data) and reopens with [[PayloadIndex.load]].
  */
final class PayloadIndex private[api] (
    spark: SparkSession, val root: String,
    val fields: Seq[(String, String)], // (field, kind ∈ keyword|integer|text)
    val zones: Map[String, Seq[(Int, Long, Long)]], // field -> (zone, min, max)
    schemaDdl: String,
    val idCol: String = "") {

  private val original = StructType.fromDDL(schemaDdl)
  private def kindOf(f: String): Option[String] = fields.find(_._1 == f).map(_._2)
  private def zoneCol(f: String) = s"__zone_$f"

  /** The read schema: data columns (original minus keyword fields, in
    * original order) + keyword partition columns (original types) +
    * zone partition columns. Explicit — partition-value type INFERENCE
    * would quietly retype a keyword like "007" as int.
    */
  private def readSchema: StructType = {
    val kw = fields.collect { case (f, "keyword") => f }.toSet
    StructType(
      original.filterNot(sf => kw.contains(sf.name)) ++
        original.filter(sf => kw.contains(sf.name)) ++
        fields.collect { case (f, "integer") =>
          StructField(zoneCol(f), IntegerType) })
  }

  /** Read the collection through the index with equality predicates on
    * keyword fields and [lo, hi] ranges on integer fields (equality on
    * an integer field is `(v, v)`). Every predicate prunes: keyword
    * values select their partition directories; integer ranges select
    * the manifest's overlapping zones (plus the exact residual filter,
    * which parquet row-group stats prune again inside each zone).
    * Columns come back in the original schema order.
    *
    * Range reads consult the NEWEST COMMITTED zones manifest on disk,
    * not this handle's load-time snapshot: the data directory is shared
    * and append-in-place, so after another handle's [[insert]] widens a
    * zone (say uid=-50 lands in zone 0), a stale handle pruning on its
    * old [1, 32] bounds would exclude the zone and silently miss the
    * appended row — the exact pruning-miss class the insert path's
    * manifest-first discipline guards against, reintroduced on the read
    * side. The manifest is driver-tiny (the same resolveSnapshot +
    * collect every insert already pays), so freshness costs one KB-read
    * per range read and zero when no range predicate is given.
    */
  def read(eq: Map[String, Seq[String]] = Map.empty,
           range: Map[String, (Long, Long)] = Map.empty,
           matchText: Map[String, Seq[String]] = Map.empty): DataFrame = {
    var df = spark.read.schema(readSchema).parquet(s"$root/data")
    eq.foreach { case (f, vs) =>
      require(kindOf(f).contains("keyword"),
        s"'$f' is not an indexed keyword field (indexed: $fields)")
      df = df.filter(col(f).isin(vs: _*))
    }
    val live = if (range.isEmpty) zones else PayloadIndex.liveZones(spark, root)
    range.foreach { case (f, (lo, hi)) =>
      require(kindOf(f).contains("integer"),
        s"'$f' is not an indexed integer field (indexed: $fields)")
      val zs = live(f).collect { case (z, zmin, zmax)
        if zmax >= lo && zmin <= hi => z }
      df = df.filter(col(zoneCol(f)).isin(zs.map(Integer.valueOf): _*) &&
        col(f) >= lo && col(f) <= hi)
    }
    var out = df.select(original.map(sf => col(sf.name)): _*)
    matchText.foreach { case (f, terms) =>
      out = gateByTokens(out, f,
        candidateIds(f, terms), residual = Some(terms))
    }
    out
  }

  /** MatchText candidate ids for field `f`: rows whose token postings
    * hold EVERY query term (Qdrant's full-text index condition —
    * conjunctive whole-word match). Only the query terms' posting
    * lists are read (pushed token-IN filter on the token-sorted
    * layout); the aggregate input is Σ df(term) posting rows and the
    * OUTPUT is ≤ the rarest term's df — query-sized for any selective
    * MatchText, so AQE turns the data-side gate into a broadcast
    * semi-join and the corpus never shuffles.
    */
  private def candidateIds(f: String, terms: Seq[String]): DataFrame = {
    require(kindOf(f).contains("text"),
      s"'$f' is not an indexed text field (indexed: $fields)")
    val qts = terms.distinct.filter(_.nonEmpty)
    require(qts.nonEmpty, s"matchText on '$f' needs at least one non-empty term")
    // a term with whitespace can never equal a split-token — it would
    // silently match NOTHING where the scan predicate matches adjacent
    // words, the one contract violation ('the index only prunes') this
    // route must never commit; phrases go through readMatchPhrase
    val spaced = qts.filter(_.exists(_.isWhitespace))
    require(spaced.isEmpty,
      s"matchText terms must be single tokens (got $spaced) — use " +
        "readMatchPhrase for adjacent-word phrases")
    PayloadIndex.postingsOf(spark, root, f)
      .filter(col("token").isin(qts: _*))
      // countDistinct, NOT count: batch-appended posting files are
      // per-batch distinct, and [[insert]]'s at-least-once replay can
      // duplicate a (token, __pid) pair across files — a raw count
      // would then overshoot qts.size and silently DROP matching rows
      .groupBy("__pid").agg(countDistinct("token").as("__nt"))
      .filter(col("__nt") === qts.size)
      .select("__pid")
  }

  /** Semi-join the candidate id set, then re-verify with the residual
    * whole-word predicate on the stored text. The residual is
    * belt-and-braces exactness: token postings and padded-contains are
    * equivalent on whitespace tokenization (spec'd), and keeping the
    * scan-predicate form in the plan means the indexed route can NEVER
    * return a row the unindexed route would not — the index only
    * prunes. Residual = None is the token-substring prefilter form,
    * where the CALLER owns the true predicate.
    */
  private def gateByTokens(df: DataFrame, f: String, cand: DataFrame,
                           residual: Option[Seq[String]]): DataFrame = {
    val gated = df.join(cand, df(idCol) === cand("__pid"), "left_semi")
    residual.fold(gated) { terms =>
      val padded = concat(lit(" "), col(f), lit(" "))
      gated.filter(terms.distinct.filter(_.nonEmpty)
        .map(t => padded.contains(s" $t ")).reduce(_ && _))
    }
  }

  /** MatchPhrase through the text index (Qdrant's phrase-match text
    * condition — the ADJACENT, ORDERED form of MatchText): candidates
    * prefilter by the phrase's tokens conjunctively (every token
    * whole-word present — implied by phrase containment, so the
    * prefilter is lossless), then the padded-contains of the FULL
    * phrase enforces adjacency and order as the residual — exactly the
    * predicate class the posting lists cannot express alone
    * ([[readWithTokenSubstring]]'s fallback contract, built in).
    */
  def readMatchPhrase(f: String, phrase: String,
                      eq: Map[String, Seq[String]] = Map.empty,
                      range: Map[String, (Long, Long)] = Map.empty)
      : DataFrame = {
    val toks = phrase.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    require(toks.nonEmpty, "matchPhrase needs a non-empty phrase")
    read(eq, range, matchText = Map(f -> toks))
      .filter(concat(lit(" "), col(f), lit(" "))
        .contains(" " + toks.mkString(" ") + " "))
  }

  /** TOKEN-SUBSTRING prefilter — the index route behind the
    * reference's substring word delete and regex delete
    * (app.py:94-139): rows of the pruned slice whose `f` holds ANY
    * token containing `substr`. This is a SUPERSET of any predicate
    * that implies "text contains `substr`" — CASE-EXACTLY (a
    * space-free required literal of a regex, a substring word match):
    * the caller MUST re-apply the true predicate on the returned rows —
    * adjacency and regex alternation live in the residual, the postings
    * only prune. A case-INSENSITIVE predicate does not imply case-exact
    * containment, so it may NOT use this route on a mixed-case literal:
    * probe each case variant (or a case-exact sub-literal) instead —
    * the residual can only narrow a superset, never recover a miss. The scan here reads the (token, __pid)
    * postings relation — the token dictionary, not the corpus text —
    * so at 100 TB a `%substr%` probe touches the posting layout's two
    * thin columns instead of every data row group.
    */
  def readWithTokenSubstring(f: String, substr: String,
                             eq: Map[String, Seq[String]] = Map.empty,
                             range: Map[String, (Long, Long)] = Map.empty)
      : DataFrame = {
    require(kindOf(f).contains("text"),
      s"'$f' is not an indexed text field (indexed: $fields)")
    require(substr.nonEmpty && !substr.contains(" "),
      s"token-substring prefilter needs a non-empty, space-free literal " +
        s"(got '$substr') — a spanning literal crosses token boundaries " +
        "and the posting lists cannot see it")
    val cand = PayloadIndex.postingsOf(spark, root, f)
      .filter(col("token").contains(substr))
      .select("__pid").distinct()
    gateByTokens(read(eq, range), f, cand, residual = None)
  }

  /** INCREMENTAL ingest — the [[AnnIndex.insert]] fixed-quantizer trade
    * on the payload axes: new rows assign to EXISTING zones (the zone
    * whose recorded range covers the value; a value in a gap or beyond
    * either end joins the nearest zone, WIDENING it) and APPEND into
    * the partitioned layout — keyword directories and parquet row-group
    * stats keep pruning with zero rewrite of existing files.
    *
    * Crash discipline, in write order: the WIDENED zone manifest
    * commits FIRST (next `gen-N` under `zones/` — tiny, one atomic
    * `_SUCCESS`), THEN the data appends. A crash between the two leaves
    * a manifest wider than the data — pruning stays CORRECT (a wider
    * zone can only select more directories, never miss a row); the
    * replayed insert re-widens idempotently (though the data rows
    * re-append: ingest is AT-LEAST-ONCE under replay — dedupe upstream
    * or rebuild, the [[AnnIndex.insert]] contract). The reverse order
    * would leave out-of-range rows invisible to range reads — silent
    * wrong answers, the one failure layout indexes must never have.
    *
    * The widened manifest merges against the NEWEST COMMITTED manifest
    * on disk, not just this object's (possibly stale) snapshot of it: a
    * stale handle committing its own view as a later generation would
    * UN-widen bounds another insert already published — the same
    * pruning-miss class, introduced through the side door.
    */
  def insert(batch: DataFrame): PayloadIndex = {
    require(batch.columns.toSet == original.map(_.name).toSet,
      s"batch columns ${batch.columns.toSeq} != indexed schema ${original.map(_.name)}")
    val normalized = batch.select(original.map(sf => col(sf.name)): _*)
    requireNonNullIds(normalized)
    val integer = fields.collect { case (f, "integer") => f }
    // cached: the SAME materialization must feed both the manifest
    // stats and the data write — a non-deterministic batch re-evaluated
    // per pass could append rows the committed manifest does not cover
    // (a pruning miss, silent)
    val withZones = assignZones(normalized, integer).cache()
    // 1. widened manifest first (see ordering note above)
    val widened = widenedFrom(withZones, integer)
    commitZonesGeneration(widened, integer)
    // 2. text postings append BEFORE the data (same never-miss
    // ordering as the manifest: a data row with no postings would be
    // invisible to matchText reads forever — silent wrong answers —
    // while an orphaned posting from a crash here names a __pid the
    // data does not hold, and the semi-join simply never selects it;
    // the replayed insert re-appends both, the documented
    // at-least-once contract)
    fields.collect { case (f, "text") => f }.foreach { f =>
      PayloadIndex.writePostings(withZones, idCol, f,
        PayloadIndex.textDir(root, f), append = true)
    }
    // 3. data appends into the same partition axes
    val partCols = fields.collect { case (f, "keyword") => f } ++ integer.map(zoneCol)
    withZones
      .sortWithinPartitions((partCols ++ integer).map(col): _*)
      .write.mode("append").partitionBy(partCols: _*).parquet(s"$root/data")
    withZones.unpersist()
    new PayloadIndex(spark, root, fields, widened, schemaDdl, idCol)
  }

  /** Zone assignment against the EXISTING manifest: boundary = each
    * zone's recorded max (except the last) — index = #bounds below the
    * value, mapped to the zone ID (manifest zones can be sparse —
    * creation-time ties leave holes). A value in a gap or beyond
    * either end joins the nearest zone (widening it).
    */
  private def assignZones(normalized: DataFrame,
                          integer: Seq[String]): DataFrame =
    integer.foldLeft(normalized) { (df, f) =>
      val zs = zones(f).sortBy(_._1)
      val idxCol = zs.init.map(_._3).foldLeft(lit(0)) { (acc, b) =>
        acc + when(col(f) > b, 1).otherwise(0) }
      df.withColumn(zoneCol(f),
        element_at(array(zs.map(z => lit(z._1)): _*), idxCol + 1))
    }

  /** Three-way widened manifest: newest committed on-disk manifest ∪
    * this handle's view ∪ the batch (see the stale-handle note on
    * [[insert]]).
    */
  private def widenedFrom(withZones: DataFrame, integer: Seq[String])
      : Map[String, Seq[(Int, Long, Long)]] =
    if (integer.isEmpty) zones
    else {
      val batchStats: Map[(String, Int), (Long, Long)] = integer.flatMap { f =>
        // null field values carry no range information (range reads
        // exclude nulls by SQL semantics) and an all-null zone group
        // would NPE the getLong below
        withZones.filter(col(f).isNotNull)
          .groupBy(col(zoneCol(f)).as("zone"))
          .agg(min(col(f)).cast("long").as("zmin"),
            max(col(f)).cast("long").as("zmax"))
          .collect().map(r => (f, r.getInt(0)) -> (r.getLong(1), r.getLong(2)))
      }.toMap
      val disk: Map[String, Map[Int, (Long, Long)]] =
        PayloadIndex.liveZones(spark, root).view
          .mapValues(_.map(t => t._1 -> (t._2, t._3)).toMap).toMap
      zones.map { case (f, zs) => f -> zs.map { case (z, zmin0, zmax0) =>
        val (dMin, dMax) = disk.getOrElse(f, Map.empty)
          .getOrElse(z, (zmin0, zmax0))
        val (zmin, zmax) = (math.min(zmin0, dMin), math.max(zmax0, dMax))
        batchStats.get((f, z)) match {
          case Some((bMin, bMax)) => (z, math.min(zmin, bMin), math.max(zmax, bMax))
          case None => (z, zmin, zmax)
        }
      } }
    }

  private def commitZonesGeneration(widened: Map[String, Seq[(Int, Long, Long)]],
                                    integer: Seq[String]): Unit =
    if (integer.nonEmpty) {
      val spark0 = spark
      import spark0.implicits._
      val next = VectorIndex.nextGeneration(spark, s"$root/zones")
      widened.toSeq.flatMap { case (f, zs) => zs.map(z => (f, z._1, z._2, z._3)) }
        .toDF("field", "zone", "zmin", "zmax").coalesce(1)
        .write.parquet(s"$root/zones/${VectorIndex.generationDir(next)}")
    }

  /** EXACTLY-ONCE ingest step — the foreachBatch body of
    * [[graft.streaming.EventStreams.payloadMaintainStream]], closing
    * [[insert]]'s documented at-least-once residue for the streaming
    * twin. Protocol per (root, batchId), in order:
    *
    *  1. COMMITTED-BATCH SKIP: the `batches/batch-N` marker exists →
    *     no-op (monotone checkpoint batchIds, the hybridMaintainStream
    *     replay discipline).
    *  2. TORN-ATTEMPT SWEEP: delete every `bN-*` file in the
    *     directories the crashed attempt's `batches/intent-N` file
    *     lists — file names CARRY the batch id precisely so a crashed
    *     previous attempt is identifiable and removable (plain appends
    *     are not), and the intent (written after staging, BEFORE the
    *     first rename) bounds where such files can be, so the sweep
    *     never lists the whole layout: at 100 TB the data tree holds
    *     every partition directory ever written, and a full recursive
    *     listing per micro-batch would dwarf the batch itself. No
    *     intent ⇒ nothing was ever published ⇒ nothing to sweep — the
    *     clean path pays one existence check. ("No intent ⇒ nothing
    *     published" is an invariant of THIS writer: torn state left by
    *     a writer that predates the intent protocol has prefixed files
    *     and no intent — sweep such a layout once, manually, before
    *     resuming its stream under this version.)
    *  3. manifest-first zone widening, then postings and data land in
    *     a batch STAGING dir; the intent commits the staged directory
    *     list; then staged files MOVE IN as `bN-` prefixed files
    *     (same-filesystem renames; postings before data, the
    *     [[insert]] never-miss ordering).
    *  4. the marker commits LAST — it exists only above a fully-moved
    *     batch, so replay after a crash at ANY point converges to
    *     exactly one copy of every row. The intent is deleted after
    *     the marker (the marker owns the skip from then on).
    *
    * Zone-manifest re-widening on replay is idempotent (same batch ⇒
    * same-or-equal bounds, committed as another generation).
    */
  def insertCommitted(batch: DataFrame, batchId: Long): PayloadIndex = {
    require(batch.columns.toSet == original.map(_.name).toSet,
      s"batch columns ${batch.columns.toSeq} != indexed schema ${original.map(_.name)}")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(s"$root/batches/batch-$batchId")
    if (fs.exists(marker)) return this // 1. already committed — replay skip
    val prefix = s"b$batchId-"
    val textFields = fields.collect { case (f, "text") => f }
    val intent = new Path(s"$root/batches/intent-$batchId")
    // 2. sweep any torn previous attempt of THIS batch — only in the
    // directories its intent names (see the protocol scaladoc; absent
    // intent ⇒ the attempt never published a file)
    PayloadIndex.readIntent(fs, intent).foreach(rel =>
      PayloadIndex.sweepPrefixed(fs, new Path(root, rel), prefix))
    val integer = fields.collect { case (f, "integer") => f }
    val normalized = batch.select(original.map(sf => col(sf.name)): _*)
    requireNonNullIds(normalized)
    val withZones = assignZones(normalized, integer).cache()
    // 3a. manifest first
    val widened = widenedFrom(withZones, integer)
    commitZonesGeneration(widened, integer)
    // 3b. postings + data stage fully, the intent commits the staged
    // directory list, THEN everything renames in with the batch prefix
    // (postings before data, the never-miss ordering)
    val staging = s"$root/staging/b$batchId"
    fs.delete(new Path(staging), true)
    textFields.foreach(f =>
      PayloadIndex.writePostings(withZones, idCol, f, s"$staging/text_$f",
        append = false))
    val partCols = fields.collect { case (f, "keyword") => f } ++ integer.map(zoneCol)
    withZones
      .sortWithinPartitions((partCols ++ integer).map(col): _*)
      .write.partitionBy(partCols: _*).parquet(s"$staging/data")
    withZones.unpersist()
    val published = textFields.map(f => s"text_$f") ++
      PayloadIndex.partFileDirs(fs, new Path(s"$staging/data"))
        .map(rel => if (rel.isEmpty) "data" else s"data/$rel")
    PayloadIndex.writeIntent(fs, intent, published)
    textFields.foreach(f =>
      PayloadIndex.moveIn(fs, new Path(s"$staging/text_$f"),
        new Path(PayloadIndex.textDir(root, f)), prefix))
    PayloadIndex.moveIn(fs, new Path(s"$staging/data"),
      new Path(s"$root/data"), prefix)
    fs.delete(new Path(s"$root/staging/b$batchId"), true)
    // 4. the commit point; the intent retires after it (a crash between
    // the two leaves a stale intent the marker skip never reads — one
    // orphaned KB, never a wrong sweep: batch ids are never reused)
    fs.mkdirs(marker.getParent)
    fs.create(marker, false).close()
    fs.delete(intent, false)
    // every piece of the fresh handle is already in hand — a full
    // load() here would pay a fields-parquet job plus the zones/schema
    // reads PER MICRO-BATCH for state this insert just wrote
    new PayloadIndex(spark, root, fields, widened, schemaDdl, idCol)
  }

  /** Text indexes name rows by `idCol`; a NULL id is unmatchable by
    * the candidate semi-join (see [[PayloadIndex.create]]'s refusal) —
    * one limit-1 probe per batch keeps the invariant through ingest.
    */
  private def requireNonNullIds(normalized: DataFrame): Unit =
    if (fields.exists(_._2 == "text"))
      require(normalized.filter(col(idCol).isNull).isEmpty,
        s"batch carries NULL '$idCol' values — postings name rows by it " +
          "and the indexed route would silently drop those rows")
}

object PayloadIndex {

  private def zoneCol(f: String) = s"__zone_$f"

  private[api] def textDir(root: String, f: String) = s"$root/text_$f"

  /** A text field's (token, __pid) posting relation. */
  private[api] def postingsOf(spark: SparkSession, root: String,
                              f: String): DataFrame =
    spark.read.parquet(textDir(root, f))

  /** Recursively move a staged write's part files into `dest`,
    * mirroring partition subdirectories and prefixing each file name
    * (same-filesystem renames — the [[PayloadIndex!.insertCommitted]]
    * publish step). `_SUCCESS`/metadata files stay behind.
    */
  private[api] def moveIn(fs: org.apache.hadoop.fs.FileSystem,
                          staged: Path, dest: Path, prefix: String): Unit =
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
    * publish intents) — the shared read/write pair, so the
    * open/readAllBytes/close idiom lives once.
    */
  private[api] def writeSmallFile(fs: org.apache.hadoop.fs.FileSystem,
                                  p: Path, content: String,
                                  overwrite: Boolean = false): Unit = {
    fs.mkdirs(p.getParent)
    val out = fs.create(p, overwrite)
    out.write(content.getBytes("UTF-8")); out.close()
  }

  private[api] def readSmallFile(fs: org.apache.hadoop.fs.FileSystem,
                                 p: Path): Option[String] =
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
  private[api] def writeIntent(fs: org.apache.hadoop.fs.FileSystem,
                               p: Path, dirs: Seq[String]): Unit =
    writeSmallFile(fs, p, dirs.mkString("\n"), overwrite = true)

  private[api] def readIntent(fs: org.apache.hadoop.fs.FileSystem,
                              p: Path): Seq[String] =
    readSmallFile(fs, p).toSeq
      .flatMap(_.split("\n").toSeq).filter(_.nonEmpty)

  /** The dest-relative directories of a staged write that hold part
    * files (partition subpaths; "" for an unpartitioned flat write) —
    * the intent's directory list, collected from the KB-scale staging
    * tree, never the destination layout.
    */
  private[api] def partFileDirs(fs: org.apache.hadoop.fs.FileSystem,
                                base: Path): Seq[String] = {
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
    * attempt's intent directories (only
    * [[PayloadIndex!.insertCommitted]] writes prefixed names).
    */
  private[api] def sweepPrefixed(fs: org.apache.hadoop.fs.FileSystem,
                                 dir: Path, prefix: String): Unit =
    if (fs.exists(dir)) fs.listStatus(dir).foreach { st =>
      if (st.isDirectory) sweepPrefixed(fs, st.getPath, prefix)
      else if (st.getPath.getName.startsWith(prefix)) fs.delete(st.getPath, false)
    }

  /** Derive + lay out one text field's postings: whitespace tokens
    * (the corpus-wide tokenization every text operator here uses),
    * distinct per (token, row id), token-partitioned and sorted so a
    * term predicate prunes to its posting list's row groups.
    */
  private[api] def writePostings(data: DataFrame, idCol: String, f: String,
                                 dir: String, append: Boolean): Unit =
    data
      .select(col(idCol).as("__pid"), explode(split(col(f), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .distinct()
      .select("token", "__pid")
      .repartition(col("token")).sortWithinPartitions("token", "__pid")
      .write.mode(if (append) "append" else "errorifexists").parquet(dir)

  /** Build the index layout for `points` at `root`. `keyword` fields
    * become partition columns, `integer` fields zone-bucketed partition
    * columns with a persisted zone map. Zone boundaries default to
    * APPROXIMATE percentiles (`approx_percentile`, one partial-agg pass
    * per field — at 100 TB an exact percentile is a sort-based
    * aggregate over the full corpus for a number that does not need to
    * be exact: pruning correctness is independent of where boundaries
    * fall, because the manifest records each zone's ACTUAL [min, max]
    * AFTER assignment — boundaries only balance zone sizes).
    * `exactZones = true` opts into the exact sort-based split; ties
    * under either mode simply leave some zones empty. Refuses to
    * overwrite an existing index — the layout is APPEND-ONLY: grow it
    * with [[PayloadIndex!.insert]] (fixed zone boundaries, widened
    * manifest), and when drift earns a re-zone, rebuild into a fresh
    * root and re-point the [[Aliases]] entry (the rotation discipline).
    */
  def create(spark: SparkSession, points: DataFrame, root: String,
             keyword: Seq[String], integer: Seq[String],
             nZones: Int = 16, exactZones: Boolean = false,
             text: Seq[String] = Nil, idCol: String = "id"): PayloadIndex = {
    val rootPath = new Path(s"$root/data")
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(rootPath), s"payload index already exists at $root")
    val cols = points.columns.toSet
    (keyword ++ integer ++ text).foreach(f =>
      require(cols.contains(f), s"field '$f' not in ${points.columns.toSeq}"))
    val overlap = keyword.intersect(integer) ++ keyword.intersect(text) ++
      integer.intersect(text)
    require(overlap.isEmpty, s"fields cannot take two index kinds: $overlap")
    require(text.isEmpty || cols.contains(idCol),
      s"text fields need id column '$idCol' in ${points.columns.toSeq} " +
        "(postings name rows by it)")
    // a NULL id can never be matched back by the candidate semi-join
    // (NULL === NULL is NULL under SQL three-valued logic), so a
    // NULL-id row with matching text would be SILENTLY DROPPED by the
    // indexed route while the scan route returns it — the one contract
    // violation ("the index only prunes") this layout must never
    // commit. One column-pruned limit-1 probe; refuse loudly instead.
    if (text.nonEmpty)
      require(points.filter(col(idCol).isNull).isEmpty,
        s"id column '$idCol' carries NULL values — postings name rows " +
          "by it and the candidate semi-join can never match a NULL " +
          "back (the indexed route would silently drop those rows)")

    // zone assignment: value > boundary_i counts — an nZones-term
    // codegen'd when-sum, boundaries from one percentile pass (approx
    // by default, see scaladoc).
    // Cached: the SAME materialization must feed the data write and the
    // zone manifest (a non-deterministic `points` plan re-evaluated per
    // pass could write rows the manifest does not cover)
    val pctFn = if (exactZones) "percentile" else "approx_percentile"
    val withZones = integer.foldLeft(points) { (df, f) =>
      // cast: percentile returns ARRAY<DOUBLE> but approx_percentile
      // returns the input type (ARRAY<BIGINT> on a long field)
      val row = points
        .select(expr(s"CAST($pctFn(`$f`, array(${
          (1 until nZones).map(i => i.toDouble / nZones).mkString(",")
        })) AS ARRAY<DOUBLE>)"))
        .head()
      // an all-NULL integer field has no percentile (NULL aggregate) and
      // would otherwise surface later as a bare NoSuchElementException
      // on the missing zones(f) key — reject it with the real reason
      require(!row.isNullAt(0),
        s"integer field '$f' is entirely NULL — no range information to " +
          "zone on; drop it from `integer` (nulls never match a range " +
          "read anyway)")
      val bounds = row.getSeq[Double](0)
      df.withColumn(zoneCol(f),
        bounds.foldLeft(lit(0)) { (acc, b) =>
          acc + when(col(f) > b, 1).otherwise(0) })
    }.cache()
    val partCols = keyword ++ integer.map(zoneCol)
    withZones
      .repartition(partCols.map(col): _*)
      // sort files by the raw integer fields: row-group min/max stats
      // then prune INSIDE each zone directory too
      .sortWithinPartitions((partCols ++ integer).map(col): _*)
      .write.partitionBy(partCols: _*).parquet(s"$root/data")

    // text postings: one (token, __pid) sub-root per text field — the
    // HybridIndex postings layout (token-partitioned + sorted, so a
    // query's token-IN predicate pushes to the scan and reads only its
    // terms' posting lists)
    text.foreach(f =>
      writePostings(withZones, idCol, f, textDir(root, f), append = false))

    import spark.implicits._
    val fieldRows = keyword.map(_ -> "keyword") ++ integer.map(_ -> "integer") ++
      text.map(_ -> "text")
    fieldRows.toDF("field", "kind").coalesce(1)
      .write.parquet(s"$root/fields")
    if (text.nonEmpty) writeSmallFile(fs, new Path(root, "idcol"), idCol)
    // exact per-zone [min, max] — the pruning map range reads consult
    // (nulls excluded: they carry no range information and an all-null
    // zone group would NPE the getLong)
    val zoneRows = integer.flatMap { f =>
      withZones.filter(col(f).isNotNull)
        .groupBy(col(zoneCol(f)).as("zone"))
        .agg(min(col(f)).cast("long").as("zmin"),
          max(col(f)).cast("long").as("zmax"))
        .collect().map(r => (f, r.getInt(0), r.getLong(1), r.getLong(2)))
    }
    // the manifest is generation-rotated ([[PayloadIndex!.insert]]
    // commits widened manifests as later generations; load resolves the
    // newest committed one)
    zoneRows.toDF("field", "zone", "zmin", "zmax").coalesce(1)
      .write.parquet(s"$root/zones/${VectorIndex.generationDir(0L)}")
    withZones.unpersist()
    val ddl = points.schema.toDDL
    writeSmallFile(fs, new Path(root, "schema.ddl"), ddl)
    new PayloadIndex(spark, root, fieldRows,
      zoneRows.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4))).toMap,
      ddl, if (text.nonEmpty) idCol else "")
  }

  /** The newest COMMITTED zones manifest under `root` — the read-side
    * freshness hook (see [[PayloadIndex!.read]]): KB-sized, one
    * resolveSnapshot + collect.
    */
  private[graft] def liveZones(spark: SparkSession, root: String)
      : Map[String, Seq[(Int, Long, Long)]] =
    spark.read
      .parquet(VectorIndex.resolveSnapshot(spark, s"$root/zones"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4)).toSeq).toMap

  /** Reopen a persisted index (manifest is driver-tiny). */
  def load(spark: SparkSession, root: String): PayloadIndex = {
    val fields = spark.read.parquet(s"$root/fields")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val zones =
      if (fields.exists(_._2 == "integer")) liveZones(spark, root)
      else Map.empty[String, Seq[(Int, Long, Long)]]
    def readSmall(name: String): Option[String] = {
      val p = new Path(root, name)
      readSmallFile(p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
    }
    val ddl = readSmall("schema.ddl").getOrElse(
      throw new IllegalArgumentException(s"no payload index at $root"))
    new PayloadIndex(spark, root, fields, zones, ddl,
      readSmall("idcol").getOrElse(""))
  }
}
