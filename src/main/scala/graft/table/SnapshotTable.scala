package graft.table

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}
import java.util.Base64

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

import scala.jdk.CollectionConverters._

/** Iceberg-style committed-snapshot table on a plain filesystem.
  *
  * No Iceberg jars ship in this sandbox (verified, SURVEY §7.0), so the
  * commit-level checkpointing the north_rule demands is built from scratch
  * with the same semantics Iceberg's spec describes publicly:
  *
  *  - data files live under `root/data/<commitId>/` (parquet);
  *  - a snapshot is a manifest `root/_snapshots/vNNNNNNNN.manifest` listing
  *    ALL entries visible at that version (full-manifest model, so a
  *    reader needs exactly one file) plus every commit id ever published
  *    (streaming replay detection must survive compaction — see below);
  *  - commits are atomic AND optimistically concurrent (Iceberg's commit
  *    model): the manifest is written to a temp path, then published with
  *    a hard-link create-if-absent — the POSIX CAS. A crash mid-write
  *    leaves the previous snapshot intact and orphaned data dirs invisible
  *    (resume semantics: a killed run never exposes partial output — the
  *    reference's durable analog of its Redis result cache,
  *    `/root/reference/src/core/cache.py:82-135`, without TTL). A
  *    concurrent writer that takes the same version makes the publish
  *    FAIL, and the loser re-derives its snapshot against the winner's
  *    manifest and retries (bounded by [[MaxCommitAttempts]]) — so a
  *    streaming ingest and a batch backfill can share one table without a
  *    lost-commit race (SnapshotTableSpec interleaves two appenders ×10
  *    and asserts all 20 commits versioned linearly);
  *  - readers resolve `latestVersion` and read only manifests ≤ it, so
  *    re-running after a kill reprocesses only uncommitted rows;
  *  - LEVELED COMPACTION bounds reader cost: per-epoch streaming commits
  *    would otherwise grow the parquet union linearly with epochs. When a
  *    level accumulates `compactFanIn` dirs they are merged into ONE dir at
  *    the next level (`data/compacted-<level>-<version>-<seq>`; no leading
  *    underscore — Spark file listings treat `_`/`.`-prefixed paths as
  *    hidden metadata), LSM-style: dir count stays ≤
  *    fanIn · log_fanIn(commits) (~15 dirs at 10^5 epochs) and each row is
  *    rewritten only O(log_fanIn(commits)) times. Merged source dirs stay
  *    on disk — older manifests still reference them and `commitMetrics`
  *    reads fresh increments by path — they just leave the current
  *    manifest. Compaction runs BEFORE the manifest move, so a crash
  *    mid-compact leaves the previous snapshot intact;
  *  - FILE STATISTICS / DATA SKIPPING (Iceberg manifest `lower_bound`/
  *    `upper_bound` analog): when `statsCol` names a STRING column, every
  *    published data dir carries its min/max of that column in the
  *    manifest, and [[readRange]] prunes whole dirs whose range cannot
  *    intersect the predicate — a point lookup on a 10^12-row table whose
  *    writer clusters by url touches only the dirs whose url range covers
  *    it, WITHOUT opening a single parquet footer. Dirs with no recorded
  *    stats (legacy manifests, empty increments, missing column) are never
  *    pruned — skipping is an optimization, absence is always safe. Each
  *    stat-tracked dir additionally carries a BLOOM SIDECAR
  *    (`_graft.bloom`, the Iceberg-puffin analog — sketches live next to
  *    the data, never in the manifest) so [[readPoint]] also skips dirs
  *    whose RANGE covers the value but whose bloom proves it absent — the
  *    pruning min/max cannot do when writers don't cluster by the lookup
  *    column;
  *  - EQUALITY DELETES / UPSERT (Iceberg v2 merge-on-read analog): every
  *    entry carries the sequence number (= snapshot version) it was
  *    published at. [[upsert]] writes the new rows as a normal data dir
  *    plus a slim parquet of their key columns under `root/deletes/`, and
  *    a row is live iff no delete with a STRICTLY LARGER sequence matches
  *    its key — so a re-crawled url replaces every earlier row for that
  *    url while rows published together with the delete survive.
  *    [[deleteKeys]] publishes a delete-only commit (takedown/GDPR).
  *    Readers apply deletes with one slim anti-ish join (delete keys are
  *    tiny next to the corpus; AQE broadcasts them); compaction APPLIES
  *    all current deletes while rewriting (copy-on-write at merge time,
  *    the merged dir takes the publishing version as its sequence) and
  *    prunes delete entries that no remaining entry is older than, so a
  *    compacted table pays zero read-time delete cost. Delete parquet
  *    files stay on disk forever — older manifests reference them, which
  *    keeps TIME TRAVEL exact across upserts;
  *  - SCHEMA EVOLUTION (additive, Iceberg model): every manifest records
  *    the unified table schema, merged at commit time ([[mergeSchemas]]:
  *    new columns append nullable, dropped columns stay, type changes are
  *    rejected). Readers pin the scan to the RECORDED schema, so dirs
  *    written before a column existed read null for it without any
  *    footer-merging pass, and [[readAt]] returns each version under the
  *    schema it was published with. Compaction materializes evolution —
  *    merged dirs physically carry every column.
  */
final class SnapshotTable(
    val root: String,
    val compactFanIn: Int = 8,
    val statsCol: Option[String] = None) {
  private val dataDir: Path = Paths.get(root, "data")
  private val delDir: Path = Paths.get(root, "deletes")
  private val snapDir: Path = Paths.get(root, "_snapshots")

  /** A committed data dir: `seq` is the snapshot version that published it
    * (0 for legacy manifests); `statMin`/`statMax` bound `statsCol` within
    * the dir when recorded; `rows` is the dir's exact row count when
    * recorded (post any delete-applying compaction — legacy manifests
    * lack it).
    */
  final case class Entry(dir: String, seq: Int, statMin: Option[String],
                         statMax: Option[String], rows: Option[Long] = None)

  /** A committed equality-delete file: parquet of key columns; applies to
    * rows in entries with a strictly smaller `seq`.
    */
  final case class Del(dir: String, seq: Int)

  final case class Snapshot(
      version: Int, entries: Vector[Entry], deletes: Vector[Del],
      rowCount: Long, commitIds: Vector[String],
      schemaJson: Option[String] = None) {
    def dataDirs: Vector[String] = entries.map(_.dir)
    /** The unified table schema recorded at this version, when the manifest
      * carries one (SCHEMA EVOLUTION — see [[mergeSchemas]]).
      */
    def schema: Option[StructType] =
      schemaJson.map(j => DataType.fromJson(j).asInstanceOf[StructType])
  }

  /** Line-3 prefix marking the commit-id history line; its absence marks a
    * first-generation manifest whose body is bare data dirs from line 3 on.
    */
  private val IdsMarker = "ids:"

  /** Optional line-4 prefix carrying the unified table schema (b64 of the
    * StructType JSON). Manifests written before schema tracking lack it —
    * readers then fall back to footer-derived schemas, exactly the old
    * behavior, so legacy tables keep reading.
    */
  private val SchemaMarker = "schema:"

  private def b64(s: String): String = Base64.getEncoder.encodeToString(s.getBytes(UTF_8))
  private def unb64(s: String): String = new String(Base64.getDecoder.decode(s), UTF_8)

  private def parseManifest(p: Path): Snapshot = {
    // manifest: line 1 version, line 2 rowCount, line 3 "ids:" + comma-joined
    // commit-id history, rest one entry per line:
    //   data dir:  dir [\t seq [\t b64(min) \t b64(max)]]   (legacy: bare dir)
    //   delete:    D \t dir \t seq
    // The "ids:" marker makes the format self-identifying: a first-generation
    // manifest (version \n rowCount \n bare data dirs) has a path on line 3,
    // never "ids:", so its dirs parse as entries instead of being consumed
    // as commit-id history (which silently dropped the first commit's rows).
    val lines = Files.readAllLines(p, UTF_8).asScala.toVector
    val hasIds = lines.length > 2 && lines(2).startsWith(IdsMarker)
    val ids =
      if (hasIds) lines(2).stripPrefix(IdsMarker).split(",", -1).toVector.filter(_.nonEmpty)
      else Vector.empty[String]
    val hasSchema = hasIds && lines.length > 3 && lines(3).startsWith(SchemaMarker)
    val schemaJson =
      if (hasSchema) Some(unb64(lines(3).stripPrefix(SchemaMarker))) else None
    val entries = Vector.newBuilder[Entry]
    val dels = Vector.newBuilder[Del]
    lines.drop(if (hasSchema) 4 else if (hasIds) 3 else 2).foreach { line =>
      val f = line.split("\t", -1)
      if (f.head == "D") dels += Del(f(1), f(2).toInt)
      // row counts append as the LAST field, keeping every older layout
      // parseable: 5 = stats+rows, 4 = legacy stats, 3 = statless+rows,
      // 2 = legacy statless, 1 = first-generation bare dir
      else if (f.length >= 5)
        entries += Entry(f(0), f(1).toInt, Some(unb64(f(2))), Some(unb64(f(3))), Some(f(4).toLong))
      else if (f.length == 4)
        entries += Entry(f(0), f(1).toInt, Some(unb64(f(2))), Some(unb64(f(3))))
      else if (f.length == 3)
        entries += Entry(f(0), f(1).toInt, None, None, Some(f(2).toLong))
      else if (f.length == 2) entries += Entry(f(0), f(1).toInt, None, None)
      else entries += Entry(f(0), 0, None, None)
    }
    Snapshot(lines.head.toInt, entries.result(), dels.result(), lines(1).toLong, ids, schemaJson)
  }

  private def manifestPath(v: Int): Path = snapDir.resolve(f"v$v%08d.manifest")

  /** All published snapshot versions, ascending. Manifests are immutable
    * and compaction never touches them, so the full history stays
    * listable until [[expireBefore]] explicitly drops a prefix of it.
    */
  def versions(): Vector[Int] = {
    if (!Files.isDirectory(snapDir)) return Vector.empty
    // Files.list holds an open directory fd until closed — streaming polls
    // this per micro-batch, so an unclosed stream leaks fds
    val stream = Files.list(snapDir)
    try stream.iterator().asScala
      .map(_.getFileName.toString)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") => n.substring(1, 9).toInt }
      .toVector.sorted
    finally stream.close()
  }

  def latest(): Option[Snapshot] = {
    val vs = versions()
    if (vs.isEmpty) None else Some(parseManifest(manifestPath(vs.max)))
  }

  def isEmpty: Boolean = latest().isEmpty

  /** Has `commitId` ever been published? The COMMIT-ID history answers
    * this, not the dir list: a compacted epoch's dir leaves the manifest,
    * but its commit must still be recognized as done by a streaming replay.
    * (Physical dir existence is NOT a safe proxy: a crash between data
    * write and manifest move leaves an uncommitted dir on disk.)
    */
  def hasCommit(commitId: String): Boolean =
    latest().exists(_.commitIds.contains(commitId))

  /** Merge-on-read: live rows of `entries` under `deletes`. A row from an
    * entry with sequence s is dropped iff a delete with sequence > s holds
    * its key. One slim join — the delete side is key columns only, tiny
    * next to the corpus, so AQE broadcasts it; when no deletes remain
    * (fresh tables, post-compaction) this is a plain multi-dir parquet
    * scan with zero overhead.
    */
  private def readEntries(
      spark: SparkSession, entries: Vector[Entry], deletes: Vector[Del],
      schemaJson: Option[String]): DataFrame = {
    // SCHEMA EVOLUTION read path: when the manifest recorded a unified
    // schema, the scan is pinned to it — Spark's parquet reader fills
    // columns a file predates with null, so dirs written before an
    // added column read correctly WITHOUT opening any footer for schema
    // discovery (Iceberg's schema-from-metadata model, not mergeSchema's
    // schema-from-every-footer). Legacy manifests (no schema line) keep
    // the footer-derived behavior.
    def scan = schemaJson match {
      case Some(j) => spark.read.schema(DataType.fromJson(j).asInstanceOf[StructType])
      case None => spark.read
    }
    if (deletes.isEmpty) return scan.parquet(entries.map(_.dir): _*)
    val keyCols = spark.read.parquet(deletes.head.dir).columns.toSeq
    val data = entries
      .map(e => scan.parquet(e.dir).withColumn("_graft_seq", lit(e.seq)))
      .reduce(_ unionByName _)
    val dels = deletes
      .map(d => spark.read.parquet(d.dir).withColumn("_graft_del_seq", lit(d.seq)))
      .reduce(_ unionByName _)
      .groupBy(keyCols.map(col): _*)
      .agg(max(col("_graft_del_seq")).as("_graft_del_seq"))
    data.join(dels, keyCols, "left")
      .where(col("_graft_del_seq").isNull || col("_graft_del_seq") <= col("_graft_seq"))
      .drop("_graft_seq", "_graft_del_seq")
  }

  /** Read the committed table (all live rows). */
  def read(spark: SparkSession): Option[DataFrame] =
    latest().filter(_.entries.nonEmpty)
      .map(s => readEntries(spark, s.entries, s.deletes, s.schemaJson))

  /** METADATA-ONLY live row count (Iceberg's `count(*)`-from-manifests
    * analog): the sum of per-entry recorded counts — answered without
    * touching a single data file, the way `SELECT count(*)` on a
    * 10^12-row table should be. Defined only when it is EXACT: every
    * entry must carry a recorded count (legacy manifests don't) and no
    * un-applied equality deletes may be outstanding (their effect is
    * unknown without a scan; compaction applies them, after which the
    * merged entry's recorded count is correct again). None ⇒ fall back
    * to `read(spark).count()`.
    */
  def fastCount: Option[Long] =
    latest().flatMap { s =>
      if (s.deletes.nonEmpty || s.entries.exists(_.rows.isEmpty)) None
      else Some(s.entries.flatMap(_.rows).sum)
    }

  /** Entries of the latest snapshot whose `[statMin, statMax]` could hold a
    * `statsCol` value in `[lo, hi]` (inclusive, string order), plus the
    * total — the data-skipping decision, exposed so callers and tests can
    * observe pruning. Entries without stats always survive.
    */
  def pruneRange(lo: String, hi: String): (Vector[Entry], Int) = {
    val s = latest().map(_.entries).getOrElse(Vector.empty)
    val kept = s.filter { e =>
      (e.statMin, e.statMax) match {
        case (Some(mn), Some(mx)) => !(mx < lo || mn > hi)
        case _ => true
      }
    }
    (kept, s.size)
  }

  /** Range read over `statsCol` with manifest-level data skipping: only
    * dirs whose recorded range intersects `[lo, hi]` are opened, the
    * row-level predicate is applied on top (dirs are pruned by RANGE, not
    * filtered), and equality deletes still apply. None when the table is
    * empty, no `statsCol` is configured, or nothing intersects.
    */
  def readRange(spark: SparkSession, lo: String, hi: String): Option[DataFrame] = {
    val c = statsCol.getOrElse(
      throw new IllegalStateException("readRange requires a statsCol-configured table"))
    latest().flatMap { s =>
      val (kept, _) = pruneRange(lo, hi)
      if (kept.isEmpty) None
      else Some(readEntries(spark, kept, s.deletes, s.schemaJson).where(col(c).between(lo, hi)))
    }
  }

  /** TIME TRAVEL: the snapshot exactly as published at `version`. Works for
    * every version ever committed — manifests are immutable and compaction
    * leaves merged SOURCE dirs (and delete files) on disk — so a training
    * run that recorded its corpus version can re-read the byte-identical
    * input later, after any number of further appends, upserts, and
    * compactions (until [[expireBefore]] deliberately retires it). None
    * if the version was never published.
    */
  def snapshotAt(version: Int): Option[Snapshot] = {
    val p = manifestPath(version)
    if (Files.isRegularFile(p)) Some(parseManifest(p)) else None
  }

  /** Read the table as of `version` (see [[snapshotAt]]), with that
    * version's deletes applied.
    */
  def readAt(spark: SparkSession, version: Int): Option[DataFrame] =
    snapshotAt(version).filter(_.entries.nonEmpty)
      .map(s => readEntries(spark, s.entries, s.deletes, s.schemaJson))

  /** INCREMENTAL APPEND READ (Iceberg incremental-scan analog): exactly
    * the rows appended by commits AFTER `sinceVersion`, read straight
    * from the per-commit data dirs — which stay on disk even when
    * compaction immediately merges them out of the manifest — pinned to
    * the CURRENT unified schema so the frame aligns with a full read.
    * This is the resume primitive a 10^12-row pipeline consumes: process
    * to version V, record V, and the next run reads only (V, latest]
    * instead of re-scanning the table. Equality deletes are deliberately
    * NOT applied — this is the append STREAM, not a table diff (the same
    * contract Iceberg's incremental read documents); delete-only commits
    * contribute nothing. Commit ids must be unique per table (hasCommit
    * already assumes this). None when nothing was appended since.
    *
    * `untilVersion` bounds the read to commits ≤ it — the consumer
    * protocol for concurrent writers: read `latest().version` FIRST,
    * pass it here, record it as processed. Without the bound, an append
    * landing between those two steps would be folded into this read but
    * not into the recorded watermark, and the next incremental read
    * would double-count it (additive incremental views corrupt
    * silently). Schema is pinned to the CURRENT unified schema either
    * way — evolution is additive, so a bounded read under a newer schema
    * only gains nullable columns.
    */
  def readAppendsSince(spark: SparkSession, sinceVersion: Int,
                       untilVersion: Int = Int.MaxValue): Option[DataFrame] =
    latest().flatMap { cur =>
      val dirs = versions().filter(v => v > sinceVersion && v <= untilVersion)
        .flatMap(v => snapshotAt(v).flatMap(_.commitIds.lastOption))
        .map(cid => dataDir.resolve(cid))
        .filter(Files.isDirectory(_))
        .map(_.toString)
      if (dirs.isEmpty) None
      else {
        val scan = cur.schema match {
          case Some(st) => spark.read.schema(st)
          case None => spark.read
        }
        Some(scan.parquet(dirs: _*))
      }
    }

  /** SNAPSHOT DIFF (the lineage-audit read: "what changed between the
    * corpus version training run A pinned and the one run B pinned?"):
    * classify every key as `added` / `deleted` / `updated` between two
    * published versions, comparing `valueCols` content via an md5-of-JSON
    * fingerprint computed map-side. Unchanged keys are OMITTED — on a
    * 10^12-row table the diff is delta-sized, the full key space is not.
    * Contract: the table is key-unique under `keyCols` (the same
    * discipline [[upsert]]/[[deleteKeys]] assume); both versions must
    * have been published ([[snapshotAt]]); an empty side (all rows
    * deleted) diffs as all-added / all-deleted.
    *
    * Scale shape: each side reduces to slim (key, fp16) rows before the
    * ONE key-keyed full-outer join — values never move, and the join is
    * the unavoidable cost of an exact diff (Iceberg's changelog scan
    * reads per-commit deltas instead; that is [[readAppendsSince]], which
    * deliberately does NOT apply deletes).
    */
  def diffVersions(spark: SparkSession, fromVersion: Int, toVersion: Int,
                   keyCols: Seq[String], valueCols: Seq[String]): Option[DataFrame] = {
    require(keyCols.nonEmpty, "diffVersions requires at least one key column")
    def slim(v: Int, fpName: String): Option[DataFrame] =
      snapshotAt(v).map { snap =>
        def project(df: DataFrame): DataFrame =
          df.select(keyCols.map(col) :+
            md5(to_json(struct(valueCols.map(col): _*))).as(fpName): _*)
        readAt(spark, v) match {
          case Some(df) => project(df)
          case None => // published but empty (everything deleted/compacted)
            snap.schema match {
              case Some(st) => project(spark.createDataFrame(
                spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st))
              case None => spark.emptyDataFrame // legacy schema-less manifest
            }
        }
      }
    (slim(fromVersion, "_graft_fp_a"), slim(toVersion, "_graft_fp_b")) match {
      case (Some(a0), Some(b0)) =>
        require(a0.columns.nonEmpty || b0.columns.nonEmpty,
          s"diffVersions($fromVersion, $toVersion): both versions are legacy " +
            "schema-less empty snapshots — no column types to diff under")
        def orEmpty(df: DataFrame, like: DataFrame, fpName: String): DataFrame =
          if (df.columns.nonEmpty) df
          else like.limit(0).withColumnRenamed(like.columns.last, fpName)
        val a = orEmpty(a0, b0, "_graft_fp_a")
        val b = orEmpty(b0, a0, "_graft_fp_b")
        Some(a.join(b, keyCols, "full_outer")
          .withColumn("change",
            when(col("_graft_fp_a").isNull, lit("added"))
              .when(col("_graft_fp_b").isNull, lit("deleted"))
              .when(col("_graft_fp_a") =!= col("_graft_fp_b"), lit("updated")))
          .where(col("change").isNotNull)
          .select(keyCols.map(col) :+ col("change"): _*))
      case _ => None
    }
  }

  /** SNAPSHOT EXPIRY (Iceberg `expire_snapshots` analog — the maintenance
    * op that stops storage growing with history): drop every manifest
    * with version < `keepFrom`, then delete the data/delete dirs no
    * retained manifest needs. Retained = every entry and delete dir of a
    * kept manifest PLUS each kept version's own commit dir (so
    * [[readAppendsSince]] keeps working across the retained range even
    * where compaction merged a commit out of its manifest). Time travel
    * before `keepFrom` is gone afterwards — that is the point. Streaming
    * replay detection survives: the commit-id HISTORY lives in the latest
    * manifest, not in the expired files. Returns
    * (manifests deleted, dirs deleted).
    */
  def expireBefore(keepFrom: Int): (Int, Int) = {
    val (drop, keep) = versions().partition(_ < keepFrom)
    if (drop.isEmpty || keep.isEmpty) return (0, 0)
    val kept = keep.flatMap(snapshotAt(_))
    val referenced: Set[String] =
      kept.flatMap(s => s.entries.map(_.dir) ++ s.deletes.map(_.dir)).toSet ++
        kept.flatMap(_.commitIds.lastOption).map(cid => dataDir.resolve(cid).toString).toSet
    def children(p: Path): Vector[Path] =
      if (!Files.isDirectory(p)) Vector.empty
      else {
        val st = Files.list(p)
        try st.iterator().asScala.filter(Files.isDirectory(_)).toVector
        finally st.close()
      }
    def deleteRecursively(p: Path): Unit = {
      val st = Files.walk(p)
      try st.sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.delete)
      finally st.close()
    }
    // manifests go FIRST: once they are gone no reader can resolve an
    // expired version, so a crash between the two phases leaves only
    // harmless orphan dirs (cleaned by the next expiry), never a live
    // manifest pointing at deleted data
    drop.foreach(v => Files.delete(manifestPath(v)))
    var removed = 0
    (children(dataDir) ++ children(delDir)).foreach { d =>
      if (!referenced.contains(d.toString)) { deleteRecursively(d); removed += 1 }
    }
    (drop.size, removed)
  }

  /** Orphan vacuum — the maintenance pass [[expireBefore]] cannot cover:
    * a writer killed BETWEEN the data write and the manifest publish (or
    * a loser of the commit CAS that dies before retrying) leaves a data
    * dir referenced by NO manifest at any version; a compaction CASCADE
    * leaves its intermediate merge targets equally unreferenced (a level-L
    * merge that immediately tips level L+1 within the same publish).
    * Invisible to every reader — the crash-safety contract — but the
    * bytes accumulate forever on a 10^12-row table with restarts (Iceberg
    * ships the same tool as `remove_orphan_files`). This removes
    * data/delete dirs referenced by NO version and stale `.tmp-`
    * manifest files.
    *
    * The grace window is the concurrency guard: a dir younger than
    * `graceMs` may belong to a commit that is mid-publish (data written,
    * CAS not yet attempted), so it is never touched — same rationale as
    * Iceberg's `older_than` default. Pass 0 only in tests.
    *
    * @return (orphan dirs removed, stale tmp manifests removed)
    */
  def vacuumOrphans(graceMs: Long = 3600000L): (Int, Int) = {
    val now = System.currentTimeMillis()
    val snaps = versions().flatMap(snapshotAt(_))
    val referenced: Set[String] =
      snaps.flatMap(s => s.entries.map(_.dir) ++ s.deletes.map(_.dir)).toSet ++
        snaps.flatMap(_.commitIds).map(cid => dataDir.resolve(cid).toString).toSet
    def children(p: Path): Vector[Path] =
      if (!Files.isDirectory(p)) Vector.empty
      else {
        val st = Files.list(p)
        try st.iterator().asScala.filter(Files.isDirectory(_)).toVector
        finally st.close()
      }
    def deleteRecursively(p: Path): Unit = {
      val st = Files.walk(p)
      try st.sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.delete)
      finally st.close()
    }
    def aged(p: Path): Boolean =
      now - Files.getLastModifiedTime(p).toMillis >= graceMs
    var dirs = 0
    (children(dataDir) ++ children(delDir)).foreach { d =>
      if (!referenced.contains(d.toString) && aged(d)) { deleteRecursively(d); dirs += 1 }
    }
    var tmps = 0
    if (Files.isDirectory(snapDir)) {
      val st = Files.list(snapDir)
      try st.iterator().asScala.foreach { p =>
        if (p.getFileName.toString.startsWith(".tmp-") && aged(p)) {
          Files.delete(p); tmps += 1
        }
      } finally st.close()
    }
    (dirs, tmps)
  }

  /** One pass over a freshly written dir: row count plus min/max of
    * `statsCol` when it is a string column with at least one non-null
    * value. (Numeric columns are deliberately not stat-tracked — the
    * manifest stores strings and string order would mis-prune numbers.)
    *
    * When stats are recorded, a BLOOM SIDECAR is also written into the dir
    * (`_graft.bloom` — underscore-prefixed, so every parquet listing
    * treats it as hidden metadata): point lookups on `statsCol` then skip
    * dirs whose range covers the value but whose bloom proves it absent —
    * the case min/max pruning cannot help with when writers don't cluster
    * by the lookup column (Iceberg stores the same sketches in puffin
    * sidecars, never the manifest, and so does this: the manifest stays
    * slim). Capacity is capped at [[BloomCapItems]] — past it fpp degrades
    * instead of the sidecar growing unbounded, same discipline as the
    * resume bloom's numBits cap.
    */
  private def statsOf(spark: SparkSession, dir: String): (Long, Option[(String, String)]) = {
    val df = spark.read.parquet(dir)
    statsCol.filter(c =>
      df.schema.fields.exists(f => f.name == c && f.dataType == StringType)) match {
      case None => (df.count(), None)
      case Some(c) =>
        // row count first — parquet count pushdown answers it from footer
        // metadata, no column scan — then ONE scan of the stats column
        // computes min/max AND fills the bloom together (previously two
        // scans: the agg pass plus df.stat.bloomFilter's own pass). The
        // min/max comparison is UTF8String binary order, matching what
        // Spark's min()/max() recorded before, and what pruneRange's
        // string comparisons assume for ASCII-clustered keys.
        val total = df.count()
        val expected = math.min(math.max(total, 1L), BloomCapItems)
        val zero: (UTF8String, UTF8String, BloomFilter) =
          (null, null, BloomFilter.create(expected, BloomFpp))
        val (mn, mx, bloom) = df.select(col(c)).queryExecution.toRdd
          .treeAggregate(zero)(
            seqOp = { case ((mn0, mx0, bf), row) =>
              if (row.isNullAt(0)) (mn0, mx0, bf)
              else {
                val s = row.getUTF8String(0).clone() // unsafe rows are reused buffers
                bf.putString(s.toString)
                ((if (mn0 == null || s.compareTo(mn0) < 0) s else mn0),
                  (if (mx0 == null || s.compareTo(mx0) > 0) s else mx0), bf)
              }
            },
            combOp = { case ((mn1, mx1, b1), (mn2, mx2, b2)) =>
              b1.mergeInPlace(b2)
              ((if (mn1 == null) mn2 else if (mn2 == null || mn1.compareTo(mn2) <= 0) mn1 else mn2),
                (if (mx1 == null) mx2 else if (mx2 == null || mx1.compareTo(mx2) >= 0) mx1 else mx2),
                b1)
            })
        val stats = if (mn == null) None else Some((mn.toString, mx.toString))
        if (stats.isDefined) {
          val out = Files.newOutputStream(Paths.get(dir, BloomSidecar))
          try bloom.writeTo(out) finally out.close()
        }
        (total, stats)
    }
  }

  /** Name of the per-dir bloom sidecar ('_'-prefixed: hidden from scans). */
  private val BloomSidecar = "_graft.bloom"
  private val BloomCapItems = 4000000L
  private val BloomFpp = 0.01

  /** Lazily-loaded sidecar blooms, keyed by dir (driver-side): a bounded
    * LRU — a long-lived driver probing many tables/epochs must not
    * accumulate one deserialized filter per dir it ever touched (each is
    * up to ~MBs at the capacity cap). Access-ordered LinkedHashMap under
    * the table's own lock; capacity covers any realistic compacted dir
    * count, so eviction only matters for the pathological caller.
    */
  private val BloomCacheMax = 256
  private val bloomCache =
    new java.util.LinkedHashMap[String, Option[BloomFilter]](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Option[BloomFilter]]): Boolean =
        size() > BloomCacheMax
    }

  private def bloomOf(dir: String): Option[BloomFilter] = bloomCache.synchronized {
    val hit = bloomCache.get(dir)
    if (hit != null) hit
    else {
      val p = Paths.get(dir, BloomSidecar)
      val loaded =
        if (!Files.isRegularFile(p)) None
        else {
          val in = Files.newInputStream(p)
          try Some(BloomFilter.readFrom(in)) finally in.close()
        }
      bloomCache.put(dir, loaded)
      loaded
    }
  }

  /** Entries of the latest snapshot that could hold `statsCol = v`:
    * min/max range pruning first, then the bloom sidecar — a dir whose
    * range covers `v` but whose bloom rejects it is provably clean and
    * skipped. Dirs without stats or sidecar always survive (absence is
    * safe, exactly like [[pruneRange]]). Returns (kept, total).
    */
  def prunePoint(v: String): (Vector[Entry], Int) = {
    val (rangeKept, total) = pruneRange(v, v)
    val kept = rangeKept.filter(e => bloomOf(e.dir).forall(_.mightContainString(v)))
    (kept, total)
  }

  /** Point lookup over `statsCol` with manifest range pruning AND bloom
    * sidecar skipping: only dirs that might hold the value are opened,
    * the row-level equality applies on top, equality deletes still apply.
    * None when the table is empty or every dir is provably clean.
    */
  def readPoint(spark: SparkSession, v: String): Option[DataFrame] = {
    val c = statsCol.getOrElse(
      throw new IllegalStateException("readPoint requires a statsCol-configured table"))
    latest().flatMap { s =>
      val (kept, _) = prunePoint(v)
      if (kept.isEmpty) None
      else Some(readEntries(spark, kept, s.deletes, s.schemaJson).where(col(c) === v))
    }
  }

  /** Append a DataFrame as a new commit. Returns the new snapshot version.
    * Write is three-phase: parquet lands in a commit-private dir, due
    * compactions merge whole levels into next-level dirs, then the
    * manifest move publishes everything at once.
    */
  def append(df: DataFrame, commitId: String): Int =
    publish(df, commitId, deleteKeyCols = Nil)

  /** Upsert: append `df` AND delete every earlier row sharing its
    * `keyCols` — the re-crawl semantics of a url-keyed pages table (same
    * url, newer fetch → the old extraction is no longer live). Rows inside
    * `df` itself are untouched (the delete's sequence equals their own).
    */
  def upsert(df: DataFrame, commitId: String, keyCols: Seq[String]): Int = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    require(keyCols.forall(df.columns.contains),
      s"key columns ${keyCols.mkString(",")} must exist in the frame")
    publish(df, commitId, keyCols)
  }

  /** ROLLBACK (Iceberg `rollback_to_snapshot` analog): publish a NEW
    * version whose visible content is exactly `toVersion`'s — entries,
    * deletes, row count, and schema copied verbatim. Nothing is deleted:
    * every intermediate version stays time-travel-readable (`readAt`),
    * and a concurrent reader never loses a manifest mid-scan. The
    * publish rides the same hard-link CAS as every commit, so a racing
    * appender either lands before the rollback (and is rolled back with
    * everything else) or re-derives against the rollback as the new
    * latest.
    *
    * Semantics pinned deliberately: rollback undoes VISIBILITY, not
    * commit history — the full commit-id list is retained (plus a
    * `rollback-to-<V>:<id>` marker), so an exactly-once producer
    * replaying an already-committed id after the rollback stays a no-op
    * (`hasCommit` true); re-ingesting rolled-back data is an explicit
    * new commit id. And because a rollback adds no data dirs,
    * `readAppendsSince` yields an EMPTY delta for it — restoring removed
    * visibility is a table-level event, not an append-stream event.
    */
  def rollbackTo(toVersion: Int, commitId: String): Int = {
    var attempt = 0
    while (true) {
      val target = snapshotAt(toVersion).getOrElse(throw new IllegalArgumentException(
        s"rollback target version $toVersion does not exist"))
      val prev = latest().getOrElse(throw new IllegalStateException(
        "rollback on an empty table"))
      require(toVersion <= prev.version,
        s"rollback target $toVersion is ahead of latest ${prev.version}")
      if (tryCommit(prev.version + 1, target.entries, target.deletes, target.rowCount,
          prev.commitIds :+ s"rollback-to-$toVersion:$commitId", target.schemaJson))
        return prev.version + 1
      attempt += 1
      require(attempt < MaxCommitAttempts,
        s"rollback '$commitId' lost the manifest CAS $MaxCommitAttempts times")
    }
    -1 // unreachable
  }

  /** Delete-only commit: every live row whose key appears in `keys`
    * (parquet of exactly the key columns) stops being visible — the
    * takedown/GDPR path. No data is rewritten until the next compaction.
    */
  def deleteKeys(keys: DataFrame, commitId: String): Int = {
    val dd = delDir.resolve(commitId).toString
    keys.dropDuplicates().write.mode("overwrite").parquet(dd)
    var attempt = 0
    while (true) {
      // same CAS loop as [[publish]] — see the concurrency note there
      val prev = latest()
      val newVersion = prev.map(_.version + 1).getOrElse(1)
      val entries0 = prev.map(_.entries).getOrElse(Vector.empty)
      val deletes0 = prev.map(_.deletes).getOrElse(Vector.empty) :+ Del(dd, newVersion)
      val schemaJson = prev.flatMap(_.schemaJson) // delete-only: schema unchanged
      val (entries, deletes) =
        compact(keys.sparkSession, entries0, deletes0, newVersion, commitId, schemaJson)
      if (tryCommit(newVersion, entries, deletes,
          prev.map(_.rowCount).getOrElse(0L),
          prev.map(_.commitIds).getOrElse(Vector.empty) :+ commitId,
          schemaJson))
        return newVersion
      attempt += 1
      require(attempt < MaxCommitAttempts,
        s"delete commit '$commitId' lost the manifest CAS $MaxCommitAttempts times")
    }
    -1 // unreachable
  }

  /** SCHEMA EVOLUTION merge (additive, the Iceberg model): columns match
    * by NAME; a column present in both sides must keep its exact type —
    * a type change is rejected loudly (no implicit promotion: silently
    * widening 10^12 committed rows is how tables corrupt). Columns only
    * in the new commit are APPENDED nullable (old dirs read null for
    * them); columns the new commit dropped STAY in the table (old rows
    * keep their values, new rows read null — removal is a reader-side
    * projection, never data loss).
    */
  private[table] def mergeSchemas(prev: StructType, next: StructType): StructType = {
    val nextByName = next.fields.map(f => f.name -> f).toMap
    val kept = prev.fields.map { p =>
      nextByName.get(p.name) match {
        case Some(n) =>
          require(n.dataType == p.dataType,
            s"schema evolution rejected: column '${p.name}' changes type " +
              s"${p.dataType.simpleString} -> ${n.dataType.simpleString}")
          p.copy(nullable = p.nullable || n.nullable)
        case None => p.copy(nullable = true)
      }
    }
    val prevNames = prev.fieldNames.toSet
    val added = next.fields.filterNot(f => prevNames.contains(f.name)).map(_.copy(nullable = true))
    StructType(kept ++ added)
  }

  /** Bound on CAS retries — a writer losing the manifest race this many
    * times in a row is pathological contention the caller should see.
    */
  val MaxCommitAttempts = 10

  private def publish(df: DataFrame, commitId: String, deleteKeyCols: Seq[String]): Int = {
    val spark = df.sparkSession
    // the data dir is commit-private (keyed by commitId) and written ONCE;
    // only the manifest derivation below re-runs when the CAS loses
    val outDir = dataDir.resolve(commitId).toString
    df.write.mode("overwrite").parquet(outDir)
    val (rows, stats) = statsOf(spark, outDir)
    val written = spark.read.parquet(outDir).schema
    var attempt = 0
    while (true) {
      // OPTIMISTIC CONCURRENCY (Iceberg's commit model): derive the new
      // snapshot against the CURRENT latest, then publish with an atomic
      // create-if-absent of the versioned manifest. A concurrent writer
      // that took our version makes the publish fail cleanly; we re-read
      // the winner's snapshot and re-derive — including re-merging the
      // schema (a conflicting type change surfaces as mergeSchemas'
      // loud rejection, never a silent overwrite) and re-running due
      // compactions against the winner's entry list.
      val prev = latest()
      val newVersion = prev.map(_.version + 1).getOrElse(1)
      val entries0 = prev.map(_.entries).getOrElse(Vector.empty) :+
        Entry(outDir, newVersion, stats.map(_._1), stats.map(_._2), Some(rows))
      val deletes0 = {
        val base = prev.map(_.deletes).getOrElse(Vector.empty)
        // a delete is pointless when nothing older exists to delete from
        if (deleteKeyCols.isEmpty || prev.forall(_.entries.isEmpty)) base
        else {
          val dd = delDir.resolve(commitId).toString
          spark.read.parquet(outDir).select(deleteKeyCols.map(col): _*)
            .dropDuplicates().write.mode("overwrite").parquet(dd)
          base :+ Del(dd, newVersion)
        }
      }
      // unified schema for the new snapshot: the just-written dir's on-disk
      // schema merged into the previous one (legacy tables without a
      // recorded schema derive theirs from footers once, here at write time)
      val unified = prev match {
        case Some(s) if s.entries.nonEmpty =>
          val prevSchema = s.schema.getOrElse(spark.read.parquet(s.dataDirs: _*).schema)
          mergeSchemas(prevSchema, written)
        case _ => written
      }
      val schemaJson = Some(unified.json)
      val (entries, deletes) = compact(spark, entries0, deletes0, newVersion, commitId, schemaJson)
      if (tryCommit(newVersion, entries, deletes,
          prev.map(_.rowCount).getOrElse(0L) + rows,
          prev.map(_.commitIds).getOrElse(Vector.empty) :+ commitId,
          schemaJson))
        return newVersion
      attempt += 1
      require(attempt < MaxCommitAttempts,
        s"commit '$commitId' lost the manifest CAS $MaxCommitAttempts times — " +
          "writer contention is pathological; retry with backoff at the caller")
    }
    -1 // unreachable
  }

  /** Dir-name prefix for merged generations. NOT underscore-prefixed:
    * Spark/Hadoop file listings silently skip `_`/`.`-prefixed paths as
    * hidden metadata — an `_c...` dir would vanish from every read.
    */
  private val CompactPrefix = "compacted-"

  /** Compaction level of a data dir: fresh commits are level 0, a dir
    * produced by merging level-L dirs is `compacted-<L+1>-...`.
    */
  private def levelOf(dir: String): Int = {
    val name = Paths.get(dir).getFileName.toString
    if (name.startsWith(CompactPrefix))
      name.substring(CompactPrefix.length, name.indexOf('-', CompactPrefix.length)).toInt
    else 0
  }

  /** Merge every level holding ≥ compactFanIn dirs into one next-level dir
    * (cascading: a merge can tip the next level over). Same-level dirs are
    * same-magnitude by construction — this is size-tiered merging without
    * needing size accounting. Current deletes are APPLIED while rewriting
    * (the merged dir takes `newVersion` as its sequence, and every current
    * delete has sequence ≤ newVersion, so none re-applies to it), then
    * deletes that no remaining entry is strictly older than are dropped
    * from the manifest — a fully compacted table reads delete-free.
    */
  private def compact(
      spark: SparkSession, entries0: Vector[Entry], deletes0: Vector[Del],
      newVersion: Int, commitId: String,
      schemaJson: Option[String]): (Vector[Entry], Vector[Del]) = {
    var entries = entries0
    var seq = 0
    var more = true
    while (more) {
      val over = entries.groupBy(e => levelOf(e.dir)).collect {
        case (l, g) if g.size >= compactFanIn => l
      }
      if (over.isEmpty) more = false
      else {
        val l = over.min
        val (group, rest) = entries.partition(e => levelOf(e.dir) == l)
        // the commitId suffix keeps concurrent writers' merge targets
        // disjoint: two writers racing the same version would otherwise
        // both write compacted-<L>-<v>-0 and the CAS loser could clobber
        // the winner's published bytes (levelOf only parses the level
        // between the first two dashes, so the suffix is inert)
        val target = dataDir.resolve(s"$CompactPrefix${l + 1}-$newVersion-$seq-$commitId").toString
        seq += 1
        // rewriting under the unified schema also MATERIALIZES evolution:
        // the merged dir physically carries every column, nulls filled
        readEntries(spark, group, deletes0, schemaJson).write.mode("overwrite").parquet(target)
        val (mergedRows, stats) = statsOf(spark, target)
        entries = rest :+ Entry(target, newVersion, stats.map(_._1), stats.map(_._2), Some(mergedRows))
      }
    }
    val deletes = deletes0.filter(d => entries.exists(_.seq < d.seq))
    (entries, deletes)
  }

  /** Publish the manifest for `newVersion` iff nobody else has: the CAS
    * primitive of the optimistic-concurrency loop. `Files.createLink`
    * (hard link) is the POSIX atomic create-if-absent — unlike
    * `ATOMIC_MOVE`, which REPLACES an existing target and was exactly the
    * round-3 race: two concurrent appenders both derived version v+1 and
    * the second rename silently clobbered the first writer's manifest
    * (its rows stayed on disk but left history — a durably lost commit).
    * Returns false when the version already exists (a concurrent writer
    * won); the caller re-derives against the winner and retries.
    */
  private def tryCommit(
      newVersion: Int, entries: Vector[Entry], deletes: Vector[Del],
      totalRows: Long, commitIds: Vector[String],
      schemaJson: Option[String]): Boolean = {
    Files.createDirectories(snapDir)
    val entryLines = entries.map { e =>
      val rowsSuffix = e.rows.map(r => s"\t$r").getOrElse("")
      (e.statMin, e.statMax) match {
        case (Some(mn), Some(mx)) => s"${e.dir}\t${e.seq}\t${b64(mn)}\t${b64(mx)}$rowsSuffix"
        case _ => s"${e.dir}\t${e.seq}$rowsSuffix"
      }
    }
    val delLines = deletes.map(d => s"D\t${d.dir}\t${d.seq}")
    val body =
      (Vector(newVersion.toString, totalRows.toString, IdsMarker + commitIds.mkString(",")) ++
        schemaJson.map(j => SchemaMarker + b64(j)).toVector ++
        entryLines ++ delLines).mkString("\n")
    // tmp name carries the last commit id (writer-unique), so two racers'
    // tmp files never collide either
    val tmp = snapDir.resolve(s".tmp-$newVersion-${commitIds.lastOption.getOrElse("0")}")
    Files.write(tmp, body.getBytes(UTF_8))
    try {
      Files.createLink(manifestPath(newVersion), tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  /** Simulate a crash AFTER data write but BEFORE manifest publish (test hook):
    * writes the data dir and returns what `append` would have committed.
    */
  def writeUncommitted(df: DataFrame, commitId: String): String = {
    val outDir = dataDir.resolve(commitId).toString
    df.write.mode("overwrite").parquet(outDir)
    outDir
  }
}
