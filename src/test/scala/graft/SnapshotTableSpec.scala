package graft

import java.nio.file.Files

import graft.table.SnapshotTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

class SnapshotTableSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-snap").toString

  private def rows(t: SnapshotTable): Map[String, Int] =
    t.read(spark).get.as[(String, Int)].collect().toMap

  test("upsert: re-crawled keys replace earlier rows; fresh keys append") {
    val t = new SnapshotTable(tmp())
    t.append(Seq(("u1", 1), ("u2", 1), ("u3", 1)).toDF("url", "gen"), "c1")
    t.upsert(Seq(("u2", 2), ("u4", 2)).toDF("url", "gen"), "c2", Seq("url"))
    assert(rows(t) == Map("u1" -> 1, "u2" -> 2, "u3" -> 1, "u4" -> 2))
  }

  test("upsert chain: latest wins across three generations") {
    val t = new SnapshotTable(tmp())
    t.upsert(Seq(("u1", 1)).toDF("url", "gen"), "c1", Seq("url"))
    t.upsert(Seq(("u1", 2)).toDF("url", "gen"), "c2", Seq("url"))
    t.upsert(Seq(("u1", 3), ("u2", 3)).toDF("url", "gen"), "c3", Seq("url"))
    assert(rows(t) == Map("u1" -> 3, "u2" -> 3))
  }

  test("diffVersions: added/deleted/updated classified; unchanged keys omitted") {
    val t = new SnapshotTable(tmp())
    val v1 = t.append(
      Seq(("u1", 1), ("u2", 1), ("u3", 1), ("u4", 1)).toDF("url", "gen"), "c1")
    t.upsert(Seq(("u2", 2), ("u5", 2)).toDF("url", "gen"), "c2", Seq("url"))
    t.deleteKeys(Seq(Tuple1("u3")).toDF("url"), "c3")
    val v3 = t.latest().get.version
    val got = t.diffVersions(spark, v1, v3, Seq("url"), Seq("gen"))
      .get.as[(String, String)].collect().toMap
    assert(got == Map("u2" -> "updated", "u3" -> "deleted", "u5" -> "added"),
      s"u1/u4 unchanged must be omitted; got $got")
    // reverse diff flips added/deleted and keeps updated
    val rev = t.diffVersions(spark, v3, v1, Seq("url"), Seq("gen"))
      .get.as[(String, String)].collect().toMap
    assert(rev == Map("u2" -> "updated", "u3" -> "added", "u5" -> "deleted"))
    // identity diff is empty; unknown version is None
    assert(t.diffVersions(spark, v3, v3, Seq("url"), Seq("gen")).get.count() == 0)
    assert(t.diffVersions(spark, v1, 99, Seq("url"), Seq("gen")).isEmpty)
  }

  test("diffVersions: a version emptied by deletes diffs as all-deleted") {
    val t = new SnapshotTable(tmp())
    val v1 = t.append(Seq(("u1", 1), ("u2", 1)).toDF("url", "gen"), "c1")
    t.deleteKeys(Seq(Tuple1("u1"), Tuple1("u2")).toDF("url"), "c2")
    val v2 = t.latest().get.version
    val got = t.diffVersions(spark, v1, v2, Seq("url"), Seq("gen"))
      .get.as[(String, String)].collect().toMap
    assert(got == Map("u1" -> "deleted", "u2" -> "deleted"))
  }

  test("rollback: visibility restored to the target; history, replay, and time travel intact") {
    val t = new SnapshotTable(tmp())
    val v1 = t.append(Seq(("u1", 1), ("u2", 1)).toDF("url", "gen"), "c1")
    t.upsert(Seq(("u2", 2), ("u3", 2)).toDF("url", "gen"), "c2", Seq("url"))
    val v3 = t.rollbackTo(v1, "rb1")
    assert(v3 == 3, "rollback must be a NEW version, not a deletion")
    assert(rows(t) == Map("u1" -> 1, "u2" -> 1), "latest reads the rollback target")
    // every version still time-travels, including the rolled-back one
    assert(t.readAt(spark, 2).get.as[(String, Int)].collect().toMap ==
      Map("u1" -> 1, "u2" -> 2, "u3" -> 2))
    // exactly-once replay: the rolled-back commit id is still recognized
    assert(t.hasCommit("c2"), "rollback undoes visibility, not commit history")
    // the rollback publishes NO data dirs: incremental readers see an empty delta
    assert(t.readAppendsSince(spark, sinceVersion = 2).isEmpty ||
      t.readAppendsSince(spark, sinceVersion = 2).get.isEmpty)
    // building forward from the rollback works
    t.append(Seq(("u5", 5)).toDF("url", "gen"), "c3")
    assert(rows(t) == Map("u1" -> 1, "u2" -> 1, "u5" -> 5))
    // guardrails
    intercept[IllegalArgumentException](t.rollbackTo(99, "rbx"))
  }

  test("composite upsert keys: only the full key matches") {
    val t = new SnapshotTable(tmp())
    t.append(Seq(("u1", "en", 1), ("u1", "de", 1)).toDF("url", "lang", "gen"), "c1")
    t.upsert(Seq(("u1", "en", 2)).toDF("url", "lang", "gen"), "c2", Seq("url", "lang"))
    val got = t.read(spark).get.as[(String, String, Int)].collect().toSet
    assert(got == Set(("u1", "en", 2), ("u1", "de", 1)))
  }

  test("first-generation manifest (bare data dirs from line 3) reads every commit") {
    // Format upgrade path: tables committed before the ids/seq/stats manifest
    // existed carry (version \n rowCount \n dir per line). The parser must
    // treat line 3 as the FIRST DATA DIR, not commit-id history — consuming
    // it as ids silently dropped that dir's rows.
    val root = tmp()
    val d1 = s"$root/data/c1"
    val d2 = s"$root/data/c2"
    Seq(("u1", 1)).toDF("url", "gen").write.parquet(d1)
    Seq(("u2", 2)).toDF("url", "gen").write.parquet(d2)
    val snapDir = java.nio.file.Paths.get(root, "_snapshots")
    Files.createDirectories(snapDir)
    Files.write(snapDir.resolve("v00000001.manifest"),
      s"1\n2\n$d1\n$d2".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val t = new SnapshotTable(root)
    assert(rows(t) == Map("u1" -> 1, "u2" -> 2))
    // a single-commit legacy table must not read as empty
    val root2 = tmp()
    val d = s"$root2/data/only"
    Seq(("u9", 9)).toDF("url", "gen").write.parquet(d)
    val sd2 = java.nio.file.Paths.get(root2, "_snapshots")
    Files.createDirectories(sd2)
    Files.write(sd2.resolve("v00000001.manifest"),
      s"1\n1\n$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(rows(new SnapshotTable(root2)) == Map("u9" -> 9))
  }

  test("deleteKeys: takedown commit hides rows without rewriting data") {
    val t = new SnapshotTable(tmp())
    t.append(Seq(("u1", 1), ("u2", 1)).toDF("url", "gen"), "c1")
    t.deleteKeys(Seq("u1").toDF("url"), "takedown-1")
    assert(rows(t) == Map("u2" -> 1))
    assert(t.hasCommit("takedown-1"))
  }

  test("time travel is exact across upserts and deletes") {
    val t = new SnapshotTable(tmp())
    val v1 = t.append(Seq(("u1", 1), ("u2", 1)).toDF("url", "gen"), "c1")
    val v2 = t.upsert(Seq(("u1", 2)).toDF("url", "gen"), "c2", Seq("url"))
    val v3 = t.deleteKeys(Seq("u2").toDF("url"), "c3")
    def at(v: Int) = t.readAt(spark, v).get.as[(String, Int)].collect().toMap
    assert(at(v1) == Map("u1" -> 1, "u2" -> 1))
    assert(at(v2) == Map("u1" -> 2, "u2" -> 1))
    assert(at(v3) == Map("u1" -> 2))
  }

  test("compaction applies deletes and prunes them from the manifest") {
    val t = new SnapshotTable(tmp(), compactFanIn = 2)
    t.append(Seq(("u1", 1), ("u2", 1)).toDF("url", "gen"), "c1")
    // second commit trips fanIn=2: the upsert's delete must be applied
    // while merging, and nothing older than it remains afterwards
    t.upsert(Seq(("u1", 2)).toDF("url", "gen"), "c2", Seq("url"))
    val snap = t.latest().get
    assert(snap.deletes.isEmpty,
      s"fully compacted table must read delete-free, got ${snap.deletes}")
    assert(rows(t) == Map("u1" -> 2, "u2" -> 1))
    // replay guard survives compaction
    assert(t.hasCommit("c1") && t.hasCommit("c2"))
  }

  test("delete entries survive compaction while older uncompacted dirs remain") {
    val t = new SnapshotTable(tmp(), compactFanIn = 3)
    t.append(Seq(("u1", 1)).toDF("url", "gen"), "c1")
    t.upsert(Seq(("u1", 2)).toDF("url", "gen"), "c2", Seq("url"))
    // fanIn=3 not reached → merge-on-read regime
    val snap = t.latest().get
    assert(snap.deletes.nonEmpty, "uncompacted upsert must keep its delete entry")
    assert(rows(t) == Map("u1" -> 2))
  }

  test("data skipping: disjoint url ranges prune whole dirs; results match a full scan") {
    val t = new SnapshotTable(tmp(), statsCol = Some("url"))
    t.append(Seq(("a/1", 1), ("a/9", 1)).toDF("url", "gen"), "c1")
    t.append(Seq(("m/1", 2), ("m/9", 2)).toDF("url", "gen"), "c2")
    t.append(Seq(("z/1", 3), ("z/9", 3)).toDF("url", "gen"), "c3")
    val (kept, total) = t.pruneRange("m/", "m/~")
    assert(total == 3 && kept.size == 1, s"expected 1 of 3 dirs kept, got ${kept.size} of $total")
    val viaRange = t.readRange(spark, "m/", "m/~").get.as[(String, Int)].collect().toSet
    val viaScan = t.read(spark).get.where(col("url").between("m/", "m/~"))
      .as[(String, Int)].collect().toSet
    assert(viaRange == viaScan && viaRange == Set(("m/1", 2), ("m/9", 2)))
    // nothing intersects → no read at all
    assert(t.readRange(spark, "q/", "q/~").isEmpty)
  }

  test("data skipping is safe: statless dirs are never pruned") {
    val t = new SnapshotTable(tmp(), statsCol = Some("url"))
    // a dir written without the stats column records no bounds
    t.append(Seq((7, 1)).toDF("other", "gen"), "c1")
    t.append(Seq(("a/1", 2)).toDF("url", "gen"), "c2")
    val (kept, total) = t.pruneRange("z/", "z/~")
    assert(total == 2 && kept.size == 1 && kept.head.statMin.isEmpty,
      "the statless dir must survive every prune")
  }

  test("fastCount: metadata-only, exact across appends and compaction, honest about deletes") {
    val t = new SnapshotTable(tmp(), compactFanIn = 3)
    t.append(Seq(("u1", 1), ("u2", 1)).toDF("url", "gen"), "c1")
    assert(t.fastCount.contains(2L))
    t.append(Seq(("u3", 2)).toDF("url", "gen"), "c2")
    assert(t.fastCount.contains(3L))
    // upsert leaves an un-applied delete → unknown without a scan
    t.upsert(Seq(("u1", 3)).toDF("url", "gen"), "c3", Seq("url"))
    // c3 tips fanIn=3 → compaction applies the delete; either way the
    // answer must be honest: None while deletes are live, exact after
    t.fastCount match {
      case Some(n) =>
        assert(t.latest().get.deletes.isEmpty, "a count with live deletes is a lie")
        assert(n == t.read(spark).get.count())
        assert(n == 3L, "u1 replaced, not duplicated")
      case None =>
        assert(t.latest().get.deletes.nonEmpty)
    }
  }

  test("bloom sidecar: point lookup skips range-covered dirs that provably lack the value") {
    val t = new SnapshotTable(tmp(), statsCol = Some("url"))
    // every dir's [min, max] spans a/…z/ — range pruning keeps all three;
    // only the per-dir bloom sidecars can separate the mid-range members
    t.append(Seq(("a/1", 1), ("m/1", 1), ("z/1", 1)).toDF("url", "gen"), "c1")
    t.append(Seq(("a/2", 2), ("m/2", 2), ("z/2", 2)).toDF("url", "gen"), "c2")
    t.append(Seq(("a/3", 3), ("m/3", 3), ("z/3", 3)).toDF("url", "gen"), "c3")
    val (rangeKept, _) = t.pruneRange("m/2", "m/2")
    assert(rangeKept.size == 3, "min/max alone cannot prune interleaved ranges")
    val (kept, total) = t.prunePoint("m/2")
    assert(total == 3 && kept.size == 1, s"bloom must leave 1 of 3 dirs, got ${kept.size}")
    val got = t.readPoint(spark, "m/2").get.as[(String, Int)].collect().toSet
    assert(got == Set(("m/2", 2)))
    assert(got == t.read(spark).get.where(col("url") === "m/2")
      .as[(String, Int)].collect().toSet, "pruning must not change the result")
    // a value no dir holds reads as empty (or prunes to nothing outright)
    assert(t.readPoint(spark, "m/9").map(_.count()).getOrElse(0L) == 0L)
  }

  test("bloom skipping is safe: sidecar-less dirs are never pruned") {
    val t = new SnapshotTable(tmp(), statsCol = Some("url"))
    t.append(Seq((7, 1)).toDF("other", "gen"), "c1") // no stats column → no sidecar
    t.append(Seq(("a/1", 2)).toDF("url", "gen"), "c2")
    val (kept, total) = t.prunePoint("zzz")
    assert(total == 2 && kept.size == 1 && kept.head.statMin.isEmpty,
      "the sidecar-less dir must survive every point prune")
  }

  test("compacted dirs carry a fresh bloom sidecar") {
    val t = new SnapshotTable(tmp(), compactFanIn = 3, statsCol = Some("url"))
    t.append(Seq(("a/1", 1)).toDF("url", "gen"), "c1")
    t.append(Seq(("m/1", 2)).toDF("url", "gen"), "c2")
    t.append(Seq(("z/1", 3)).toDF("url", "gen"), "c3")
    val snap = t.latest().get
    assert(snap.entries.size == 1 && snap.entries.head.dir.contains("compacted-"),
      "fanIn=3 must merge the three commits")
    assert(t.readPoint(spark, "m/1").get.collect().length == 1)
    // the merged dir's range spans a/…z/ but its bloom rejects an absent key
    val (none, _) = t.prunePoint("q/404")
    assert(none.isEmpty, "compacted dir bloom must reject an absent value")
  }

  test("upsert into an empty table publishes no delete entry") {
    val t = new SnapshotTable(tmp())
    t.upsert(Seq(("u1", 1)).toDF("url", "gen"), "c1", Seq("url"))
    assert(t.latest().get.deletes.isEmpty)
    assert(rows(t) == Map("u1" -> 1))
  }

  test("stats bounds round-trip through the manifest (base64, tab-safe)") {
    val t = new SnapshotTable(tmp(), statsCol = Some("url"))
    t.append(Seq(("héllo/ü", 1), ("zzz", 1)).toDF("url", "gen"), "c1")
    val e = t.latest().get.entries.head
    assert(e.statMin.contains("héllo/ü") && e.statMax.contains("zzz"))
  }

  test("schema evolution: added column reads null from pre-evolution dirs") {
    val t = new SnapshotTable(tmp())
    t.append(Seq(("u1", 1), ("u2", 1)).toDF("url", "gen"), "c1")
    t.append(Seq(("u3", 2, "en")).toDF("url", "gen", "lang"), "c2")
    val got = t.read(spark).get.select("url", "gen", "lang")
      .as[(String, Int, Option[String])].collect().toSet
    assert(got == Set(("u1", 1, None), ("u2", 1, None), ("u3", 2, Some("en"))))
    // time travel returns the PRE-evolution schema at v1
    assert(t.readAt(spark, 1).get.columns.toSeq == Seq("url", "gen"))
  }

  test("schema evolution: dropped column stays; new rows read null for it") {
    val t = new SnapshotTable(tmp())
    t.append(Seq(("u1", 1, "en")).toDF("url", "gen", "lang"), "c1")
    t.append(Seq(("u2", 2)).toDF("url", "gen"), "c2")
    val got = t.read(spark).get.select("url", "lang")
      .as[(String, Option[String])].collect().toSet
    assert(got == Set(("u1", Some("en")), ("u2", None)))
  }

  test("schema evolution: a type change is rejected loudly") {
    val t = new SnapshotTable(tmp())
    t.append(Seq(("u1", 1)).toDF("url", "gen"), "c1")
    val e = intercept[IllegalArgumentException] {
      t.append(Seq(("u2", "two")).toDF("url", "gen"), "c2")
    }
    assert(e.getMessage.contains("gen") && e.getMessage.contains("changes type"))
  }

  test("schema evolution: upsert with added column still deletes by key") {
    val t = new SnapshotTable(tmp())
    t.append(Seq(("u1", 1), ("u2", 1)).toDF("url", "gen"), "c1")
    t.upsert(Seq(("u2", 2, "en")).toDF("url", "gen", "lang"), "c2", Seq("url"))
    val got = t.read(spark).get.select("url", "gen", "lang")
      .as[(String, Int, Option[String])].collect().toSet
    assert(got == Set(("u1", 1, None), ("u2", 2, Some("en"))))
  }

  test("compaction materializes evolution: merged dir carries every column") {
    val t = new SnapshotTable(tmp(), compactFanIn = 3)
    t.append(Seq(("u1", 1)).toDF("url", "gen"), "c1")
    t.append(Seq(("u2", 2)).toDF("url", "gen"), "c2")
    t.append(Seq(("u3", 3, "en")).toDF("url", "gen", "lang"), "c3") // tips fan-in
    val s = t.latest().get
    assert(s.entries.size == 1, "three level-0 dirs must merge into one")
    // the merged parquet itself (read WITHOUT the manifest schema) has lang
    assert(spark.read.parquet(s.entries.head.dir).columns.contains("lang"))
    val got = t.read(spark).get.select("url", "lang")
      .as[(String, Option[String])].collect().toSet
    assert(got == Set(("u1", None), ("u2", None), ("u3", Some("en"))))
  }

  test("incremental read: appends since V, exact even when compaction merged them away") {
    val t = new SnapshotTable(tmp(), compactFanIn = 2) // merge aggressively
    t.append(Seq(("u1", 1)).toDF("url", "gen"), "c1")
    t.append(Seq(("u2", 2)).toDF("url", "gen"), "c2") // compacts c1+c2
    t.append(Seq(("u3", 3)).toDF("url", "gen"), "c3")
    assert(t.latest().get.version == 3)
    val inc = t.readAppendsSince(spark, 1).get.as[(String, Int)].collect().toSet
    assert(inc == Set(("u2", 2), ("u3", 3)),
      "appends after v1 must surface even though c2's dir was compacted out of the manifest")
    assert(t.readAppendsSince(spark, 3).isEmpty, "nothing appended after latest")
  }

  test("incremental read ignores delete-only commits and applies no deletes") {
    val t = new SnapshotTable(tmp())
    t.append(Seq(("u1", 1)).toDF("url", "gen"), "c1")
    t.append(Seq(("u2", 2)).toDF("url", "gen"), "c2")
    t.deleteKeys(Seq(Tuple1("u2")).toDF("url"), "takedown")
    val inc = t.readAppendsSince(spark, 1).get.as[(String, Int)].collect().toSet
    assert(inc == Set(("u2", 2)), "the append stream is not a diff: deletes do not apply")
  }

  test("incremental read pins the current schema across evolution") {
    val t = new SnapshotTable(tmp())
    t.append(Seq(("u1", 1)).toDF("url", "gen"), "c1")
    t.append(Seq(("u2", 2, "en")).toDF("url", "gen", "lang"), "c2")
    val since0 = t.readAppendsSince(spark, 0).get.select("url", "lang")
      .as[(String, Option[String])].collect().toSet
    assert(since0 == Set(("u1", None), ("u2", Some("en"))))
  }

  test("expireBefore: old history dies, retained reads and incremental survive") {
    val t = new SnapshotTable(tmp(), compactFanIn = 2)
    t.append(Seq(("u1", 1)).toDF("url", "gen"), "c1")
    t.append(Seq(("u2", 2)).toDF("url", "gen"), "c2")
    t.append(Seq(("u3", 3)).toDF("url", "gen"), "c3")
    val (manifests, dirs) = t.expireBefore(3)
    assert(manifests == 2 && dirs > 0)
    assert(t.versions() == Vector(3) && t.readAt(spark, 1).isEmpty)
    assert(rows(t) == Map("u1" -> 1, "u2" -> 2, "u3" -> 3), "latest read intact after expiry")
    // c3 is version 3's own commit dir: retained, so incremental still works
    assert(t.readAppendsSince(spark, 2).get.as[(String, Int)].collect().toSet == Set(("u3", 3)))
    assert(t.hasCommit("c1"), "commit-id history lives in the latest manifest, not expired files")
  }

  test("expireBefore keeps every dir a retained manifest references") {
    val t = new SnapshotTable(tmp()) // default fan-in: no compaction
    t.append(Seq(("u1", 1)).toDF("url", "gen"), "c1")
    t.append(Seq(("u2", 2)).toDF("url", "gen"), "c2")
    val (m, d) = t.expireBefore(2)
    assert(m == 1 && d == 0, "v2 still references c1's dir, so nothing may be deleted")
    assert(rows(t) == Map("u1" -> 1, "u2" -> 2))
  }

  test("incremental read honors untilVersion: appends past the bound stay out") {
    // the consumer protocol for concurrent writers: read latest() first,
    // bound the incremental scan to it, record it — a commit landing in
    // between must not be folded into state watermarked below it
    val t = new SnapshotTable(tmp())
    t.append(Seq(("u1", 1)).toDF("url", "gen"), "c1")
    t.append(Seq(("u2", 2)).toDF("url", "gen"), "c2")
    t.append(Seq(("u3", 3)).toDF("url", "gen"), "c3") // the "racing" append
    val bounded = t.readAppendsSince(spark, 1, untilVersion = 2).get
      .as[(String, Int)].collect().toSet
    assert(bounded == Set(("u2", 2)), s"got $bounded")
    assert(t.readAppendsSince(spark, 2, untilVersion = 2).isEmpty, "empty window → None")
    val unbounded = t.readAppendsSince(spark, 1).get.as[(String, Int)].collect().toSet
    assert(unbounded == Set(("u2", 2), ("u3", 3)))
  }

  test("optimistic concurrency: two interleaved appenders, all 20 commits land, history is linear") {
    // The round-3 race: commits were ATOMIC_MOVE-published, which REPLACES
    // an existing target — two appenders deriving the same version meant
    // the second rename silently clobbered the first manifest (a durably
    // lost commit). The CAS publish (hard-link create-if-absent) + the
    // re-derive-and-retry loop must make every commit land exactly once.
    val t = new SnapshotTable(tmp(), compactFanIn = 4) // low fan-in: compactions race too
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 2).map { w =>
      new Thread(() => {
        try {
          for (i <- 0 until 10)
            t.append(Seq((s"w$w-c$i", w * 100 + i)).toDF("url", "gen"), s"w$w-c$i")
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"no appender may fail: ${errs.asScala.map(_.getMessage)}")
    // linear version history: exactly 20 versions, 1..20, no gaps
    assert(t.versions() == (1 to 20).toVector, s"versions: ${t.versions()}")
    // every commit visible in the history AND every row readable
    val latest = t.latest().get
    val expectedIds = (for (w <- 0 until 2; i <- 0 until 10) yield s"w$w-c$i").toSet
    assert(latest.commitIds.toSet == expectedIds, "all 20 commit ids recorded")
    assert(latest.commitIds.size == 20, "no duplicate commit ids")
    assert(rows(t).size == 20, "all 20 rows live")
    assert(t.fastCount.contains(20L), "metadata row count exact after racing compactions")
    // commit-id order embeds version order: each manifest's id list is a
    // strict prefix of its successor's (linear history, no forks)
    val histories = t.versions().map(v => t.snapshotAt(v).get.commitIds)
    histories.sliding(2).foreach {
      case Vector(a, b) => assert(b.startsWith(a) && b.size == a.size + 1,
        s"history must grow linearly: $a -> $b")
      case _ =>
    }
  }

  test("vacuumOrphans: crash leftovers die, referenced and compacted-out dirs survive, grace protects young dirs") {
    val root = tmp()
    val t = new SnapshotTable(root, compactFanIn = 2)
    // four commits with fanIn 2 force compaction, so older manifests
    // reference dirs the CURRENT manifest no longer lists
    (1 to 4).foreach(i => t.append(Seq((s"u$i", i)).toDF("url", "gen"), s"c$i"))
    // two crash signatures: data written but never published, and a
    // stale tmp manifest from a hard-killed CAS
    t.writeUncommitted(Seq(("ux", 99)).toDF("url", "gen"), "crashed-commit")
    Files.write(java.nio.file.Paths.get(root, "_snapshots", ".tmp-9-crashed"),
      "junk".getBytes("UTF-8"))
    // a young orphan is protected by the grace window
    val (d0, t0) = t.vacuumOrphans(graceMs = 3600000L)
    assert((d0, t0) == ((0, 0)), s"grace must protect young orphans, removed ($d0, $t0)")
    // two orphan dirs die: the crashed commit AND the intra-commit
    // cascade intermediate (v4's level-1 merge target was itself merged
    // to level 2 within the same publish, so no manifest ever listed it)
    val (d1, t1) = t.vacuumOrphans(graceMs = 0L)
    assert(d1 == 2 && t1 == 1, s"expected crash dir + cascade intermediate + tmp, got ($d1, $t1)")
    // current read unaffected; TIME TRAVEL unaffected (compacted-out dirs
    // are referenced by older manifests and must survive the vacuum)
    assert(rows(t) == (1 to 4).map(i => s"u$i" -> i).toMap)
    assert(t.readAt(spark, 2).get.count() == 2L, "older version must still read after vacuum")
    // idempotent: nothing left to remove
    assert(t.vacuumOrphans(graceMs = 0L) == ((0, 0)))
  }

  test("legacy manifest without a schema line still reads and can evolve") {
    val root = tmp()
    val t = new SnapshotTable(root)
    t.append(Seq(("u1", 1)).toDF("url", "gen"), "c1")
    // strip the schema line, simulating a manifest from before evolution
    val p = java.nio.file.Paths.get(root, "_snapshots", "v00000001.manifest")
    val kept = Files.readAllLines(p).asScala.filterNot(_.startsWith("schema:"))
    Files.write(p, kept.mkString("\n").getBytes("UTF-8"))
    assert(rows(t) == Map("u1" -> 1), "legacy read must fall back to footers")
    t.append(Seq(("u2", 2, "en")).toDF("url", "gen", "lang"), "c2")
    val got = t.read(spark).get.select("url", "gen", "lang")
      .as[(String, Int, Option[String])].collect().toSet
    assert(got == Set(("u1", 1, None), ("u2", 2, Some("en"))))
  }
}
