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
  *  - a snapshot is a JSON manifest `root/_snapshots/vNNNNNNNN.json` listing
  *    ALL data directories visible at that version (full-manifest model, so a
  *    reader needs exactly one file);
  *  - commits are atomic: manifest written to a temp path then moved with
  *    `ATOMIC_MOVE`; a crash mid-write leaves the previous snapshot intact
  *    and orphaned data dirs invisible (resume semantics: a killed run never
  *    exposes partial output — the reference's durable analog of its Redis
  *    result cache, `/root/reference/src/core/cache.py:82-135`, without TTL);
  *  - readers resolve `latestVersion` and read only manifests ≤ it, so
  *    re-running after a kill reprocesses only uncommitted rows.
  */
final class SnapshotTable(val root: String) {
  private val dataDir: Path = Paths.get(root, "data")
  private val snapDir: Path = Paths.get(root, "_snapshots")

  final case class Snapshot(version: Int, dataDirs: Vector[String], rowCount: Long)

  private def parseManifest(p: Path): Snapshot = {
    // manifest format: line 1 "version", line 2 rowCount, rest: data dirs
    val lines = Files.readAllLines(p, UTF_8).asScala.toVector
    Snapshot(lines.head.toInt, lines.drop(2), lines(1).toLong)
  }

  private def manifestPath(v: Int): Path = snapDir.resolve(f"v$v%08d.manifest")

  def latest(): Option[Snapshot] = {
    if (!Files.isDirectory(snapDir)) return None
    // Files.list holds an open directory fd until closed — streaming polls
    // this per micro-batch, so an unclosed stream leaks fds
    val stream = Files.list(snapDir)
    val versions =
      try stream.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case n if n.startsWith("v") && n.endsWith(".manifest") => n.substring(1, 9).toInt }
        .toVector
      finally stream.close()
    if (versions.isEmpty) None else Some(parseManifest(manifestPath(versions.max)))
  }

  def isEmpty: Boolean = latest().isEmpty

  /** Read the committed table (union of all committed data dirs). */
  def read(spark: SparkSession): Option[DataFrame] =
    latest().filter(_.dataDirs.nonEmpty).map(s => spark.read.parquet(s.dataDirs: _*))

  /** Append a DataFrame as a new commit. Returns the new snapshot version.
    * Write is two-phase: parquet lands in a commit-private dir first, the
    * manifest move publishes it.
    */
  def append(df: DataFrame, commitId: String): Int = {
    val prev = latest()
    val newVersion = prev.map(_.version + 1).getOrElse(1)
    val outDir = dataDir.resolve(commitId).toString
    df.write.mode("overwrite").parquet(outDir)
    val rows = df.sparkSession.read.parquet(outDir).count()
    commit(prev, newVersion, outDir, rows)
  }

  private def commit(prev: Option[Snapshot], newVersion: Int, outDir: String, rows: Long): Int = {
    Files.createDirectories(snapDir)
    val dirs = prev.map(_.dataDirs).getOrElse(Vector.empty) :+ outDir
    val total = prev.map(_.rowCount).getOrElse(0L) + rows
    val body = (Vector(newVersion.toString, total.toString) ++ dirs).mkString("\n")
    val tmp = snapDir.resolve(s".tmp-$newVersion-$rows")
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
