package graft.table

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/** Iceberg-style committed-snapshot table on a plain filesystem.
  *
  * No Iceberg jars ship in this sandbox (verified, SURVEY §7.0), so the
  * commit-level checkpointing the north_rule demands is built from scratch
  * with the same semantics Iceberg's spec describes publicly:
  *
  *  - data files live under `root/data/<commitId>/` (parquet);
  *  - a snapshot is a manifest `root/_snapshots/vNNNNNNNN.manifest` listing
  *    ALL data directories visible at that version (full-manifest model, so a
  *    reader needs exactly one file) plus every commit id ever published
  *    (streaming replay detection must survive compaction — see below);
  *  - commits are atomic: manifest written to a temp path then moved with
  *    `ATOMIC_MOVE`; a crash mid-write leaves the previous snapshot intact
  *    and orphaned data dirs invisible (resume semantics: a killed run never
  *    exposes partial output — the reference's durable analog of its Redis
  *    result cache, `/root/reference/src/core/cache.py:82-135`, without TTL);
  *  - readers resolve `latestVersion` and read only manifests ≤ it, so
  *    re-running after a kill reprocesses only uncommitted rows;
  *  - LEVELED COMPACTION bounds reader cost: per-epoch streaming commits
  *    would otherwise grow the parquet union linearly with epochs. When a
  *    level accumulates `compactFanIn` dirs they are merged into ONE dir at
  *    the next level (`data/compacted-<level>-<version>-<seq>`; no leading underscore —
  *    Spark file listings treat `_`/`.`-prefixed paths as hidden metadata), LSM-style: dir
  *    count stays ≤ fanIn · log_fanIn(commits) (~15 dirs at 10^5 epochs)
  *    and each row is rewritten only O(log_fanIn(commits)) times. Merged
  *    source dirs stay on disk — older manifests still reference them and
  *    `commitMetrics` reads fresh increments by path — they just leave the
  *    current manifest. Compaction runs BEFORE the manifest move, so a
  *    crash mid-compact leaves the previous snapshot intact.
  */
final class SnapshotTable(val root: String, val compactFanIn: Int = 8) {
  private val dataDir: Path = Paths.get(root, "data")
  private val snapDir: Path = Paths.get(root, "_snapshots")

  final case class Snapshot(
      version: Int, dataDirs: Vector[String], rowCount: Long, commitIds: Vector[String])

  private def parseManifest(p: Path): Snapshot = {
    // manifest format: line 1 version, line 2 rowCount, line 3 the
    // comma-joined commit-id history, rest: data dirs
    val lines = Files.readAllLines(p, UTF_8).asScala.toVector
    val ids = lines(2).split(",", -1).toVector.filter(_.nonEmpty)
    Snapshot(lines.head.toInt, lines.drop(3), lines(1).toLong, ids)
  }

  private def manifestPath(v: Int): Path = snapDir.resolve(f"v$v%08d.manifest")

  /** All published snapshot versions, ascending. Every manifest stays on
    * disk forever (compaction rewrites data dirs, never manifests), so the
    * full history is always listable.
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

  /** Read the committed table (union of all committed data dirs). */
  def read(spark: SparkSession): Option[DataFrame] =
    latest().filter(_.dataDirs.nonEmpty).map(s => spark.read.parquet(s.dataDirs: _*))

  /** TIME TRAVEL: the snapshot exactly as published at `version`. Works for
    * every version ever committed — manifests are immutable and compaction
    * leaves merged SOURCE dirs on disk (they only leave the current
    * manifest) — so a training run that recorded its corpus version can
    * re-read the byte-identical input later, after any number of further
    * appends and compactions. None if the version was never published.
    */
  def snapshotAt(version: Int): Option[Snapshot] = {
    val p = manifestPath(version)
    if (Files.isRegularFile(p)) Some(parseManifest(p)) else None
  }

  /** Read the table as of `version` (see [[snapshotAt]]). */
  def readAt(spark: SparkSession, version: Int): Option[DataFrame] =
    snapshotAt(version).filter(_.dataDirs.nonEmpty)
      .map(s => spark.read.parquet(s.dataDirs: _*))

  /** Append a DataFrame as a new commit. Returns the new snapshot version.
    * Write is three-phase: parquet lands in a commit-private dir, due
    * compactions merge whole levels into next-level dirs, then the
    * manifest move publishes everything at once.
    */
  def append(df: DataFrame, commitId: String): Int = {
    val prev = latest()
    val newVersion = prev.map(_.version + 1).getOrElse(1)
    val outDir = dataDir.resolve(commitId).toString
    df.write.mode("overwrite").parquet(outDir)
    val rows = df.sparkSession.read.parquet(outDir).count()
    val dirs = compact(
      df.sparkSession, prev.map(_.dataDirs).getOrElse(Vector.empty) :+ outDir, newVersion)
    commit(newVersion, dirs,
      prev.map(_.rowCount).getOrElse(0L) + rows,
      prev.map(_.commitIds).getOrElse(Vector.empty) :+ commitId)
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
    * needing size accounting.
    */
  private def compact(spark: SparkSession, dirs0: Vector[String], newVersion: Int): Vector[String] = {
    var dirs = dirs0
    var seq = 0
    var more = true
    while (more) {
      val over = dirs.groupBy(levelOf).collect { case (l, g) if g.size >= compactFanIn => l }
      if (over.isEmpty) more = false
      else {
        val l = over.min
        val (group, rest) = dirs.partition(d => levelOf(d) == l)
        val target = dataDir.resolve(s"$CompactPrefix${l + 1}-$newVersion-$seq").toString
        seq += 1
        spark.read.parquet(group: _*).write.mode("overwrite").parquet(target)
        dirs = rest :+ target
      }
    }
    dirs
  }

  private def commit(
      newVersion: Int, dirs: Vector[String], totalRows: Long, commitIds: Vector[String]): Int = {
    Files.createDirectories(snapDir)
    val body =
      (Vector(newVersion.toString, totalRows.toString, commitIds.mkString(",")) ++ dirs)
        .mkString("\n")
    val tmp = snapDir.resolve(s".tmp-$newVersion-$totalRows")
    Files.write(tmp, body.getBytes(UTF_8))
    Files.move(tmp, manifestPath(newVersion), StandardCopyOption.ATOMIC_MOVE)
    newVersion
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
