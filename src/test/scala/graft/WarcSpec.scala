package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import graft.warc.{Warc, WarcShards}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** WARC framing: byte-exact round trips (plain and per-record-gzip),
  * length-only payload framing, lenient resync over damaged bytes, and
  * the Spark shard assembly's byte determinism.
  */
class WarcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def rec(url: String, ts: Long, ct: String, p: String) =
    (url, ts, ct, p.getBytes(UTF_8))

  test("plain round trip preserves every header field and payload byte") {
    val in = Seq(
      rec("https://a.example/1", 1700000000000L, "text/html", "<html>one</html>"),
      rec("https://a.example/2", 1700000001500L, "application/pdf", "%PDF-1.4 fake"),
      rec("https://a.example/3", 1700000002000L, "text/plain", ""))
    val blob = Warc.writeArchive(in.iterator, gzip = false)
    val out = Warc.parseArchive(blob)
    assert(out.skippedBytes == 0L)
    assert(out.records.size == 3)
    out.records.zip(in).foreach { case (r, (url, ts, ct, p)) =>
      assert(r.url == url && r.dateMs == ts && r.contentType == ct)
      assert(r.recordType == "response")
      assert(java.util.Arrays.equals(r.payload, p))
    }
  }

  test("gzip archive: one member per record, multi-member stream parses whole") {
    val in = Seq(
      rec("https://b.example/1", 1700000000000L, "text/html", "alpha"),
      rec("https://b.example/2", 1700000000001L, "text/html", "beta"),
      rec("https://b.example/3", 1700000000002L, "text/html", "gamma"))
    val blob = Warc.writeArchive(in.iterator, gzip = true)
    assert((blob(0) & 0xff) == 0x1f && (blob(1) & 0xff) == 0x8b, "gzip magic")
    // three independent members: the magic appears at least 3 times
    val magics = blob.sliding(2).count(w => (w(0) & 0xff) == 0x1f && (w(1) & 0xff) == 0x8b)
    assert(magics >= 3, s"expected one gzip member per record, saw $magics magics")
    val out = Warc.parseArchive(blob)
    assert(out.records.map(_.url) == in.map(_._1).toVector)
    assert(out.skippedBytes == 0L)
  }

  test("payload containing literal WARC headers survives (framing is by length only)") {
    val trap = "WARC/1.0\r\nWARC-Target-URI: https://evil.example/\r\n\r\nfake"
    val in = Seq(
      rec("https://c.example/1", 1700000000000L, "text/plain", trap),
      rec("https://c.example/2", 1700000000001L, "text/plain", "clean"))
    val out = Warc.parseArchive(Warc.writeArchive(in.iterator, gzip = false))
    assert(out.records.size == 2)
    assert(new String(out.records(0).payload, UTF_8) == trap)
    assert(out.records.map(_.url) ==
      Vector("https://c.example/1", "https://c.example/2"))
  }

  test("damaged bytes between records are skipped, counted, and do not kill the parse") {
    val a = Warc.writeArchive(Iterator(rec("https://d.example/1", 1L, "t", "one")), gzip = false)
    val b = Warc.writeArchive(Iterator(rec("https://d.example/2", 2L, "t", "two")), gzip = false)
    val garbage = "!!corrupt bytes!!".getBytes(UTF_8)
    val blob = new ByteArrayOutputStream()
    blob.write(a); blob.write(garbage); blob.write(b)
    val out = Warc.parseArchive(blob.toByteArray)
    assert(out.records.map(_.url) == Vector("https://d.example/1", "https://d.example/2"))
    assert(out.skippedBytes == garbage.length.toLong)
  }

  test("truncated record resyncs to the next magic instead of aborting") {
    val good = Warc.writeArchive(Iterator(rec("https://e.example/2", 2L, "t", "ok")), gzip = false)
    val truncated = ("WARC/1.0\r\nWARC-Target-URI: https://e.example/1\r\n" +
      "WARC-Date: 1970-01-01T00:00:00Z\r\nContent-Length: 999999\r\n\r\nshort").getBytes(UTF_8)
    val blob = new ByteArrayOutputStream()
    blob.write(truncated); blob.write(good)
    val out = Warc.parseArchive(blob.toByteArray)
    assert(out.records.map(_.url) == Vector("https://e.example/2"))
    assert(out.skippedBytes > 0L)
  }

  test("CRLF in a hostile url cannot hijack record framing (header injection)") {
    val evil = "https://x.example/a\r\nContent-Length: 0\r\nX-Inject: 1"
    val in = Seq(
      rec(evil, 1700000000000L, "text/plain", "the real payload bytes"),
      rec("https://x.example/clean", 1700000000001L, "text/plain", "after"))
    val out = Warc.parseArchive(Warc.writeArchive(in.iterator, gzip = false))
    assert(out.records.size == 2 && out.skippedBytes == 0L)
    // the injected Content-Length must NOT win: payload intact
    assert(new String(out.records(0).payload, UTF_8) == "the real payload bytes")
    // CR/LF percent-encoded in the url, information preserved
    assert(out.records(0).url == "https://x.example/a%0D%0AContent-Length: 0%0D%0AX-Inject: 1")
    assert(out.records(1).url == "https://x.example/clean")
  }

  test("writer is deterministic: same records → byte-identical archive (gzip too)") {
    val in = Seq(
      rec("https://f.example/1", 1700000000000L, "text/html", "same"),
      rec("https://f.example/2", 1700000000001L, "text/html", "bytes"))
    assert(java.util.Arrays.equals(
      Warc.writeArchive(in.iterator, gzip = false),
      Warc.writeArchive(in.iterator, gzip = false)))
    assert(java.util.Arrays.equals(
      Warc.writeArchive(in.iterator, gzip = true),
      Warc.writeArchive(in.iterator, gzip = true)))
  }

  test("shard assembly + parse round-trips the binary pages payloads byte-exactly") {
    import spark.implicits._
    val pages = graft.pages.PagesGen.pages(spark, "/root/testdata/sf0.001").limit(60)
      .select(col("url"),
        (unix_timestamp(col("warc_ts")) * 1000L).as("ts_ms"),
        lit("application/octet-stream").as("ct"), col("html").as("payload"))
    val archives = WarcShards.toArchives(pages, "url", "ts_ms", "ct", "payload",
      shards = 4, gzip = true)
    assert(archives.count() <= 4)
    val back = WarcShards.parse(archives, "warc")
      .select(col("url"), md5(col("payload")).as("got"), col("content_length"))
    val expect = pages.select(col("url"), md5(col("payload")).as("want"),
      length(col("payload")).cast("long").as("want_len"))
    val joined = back.join(expect, "url").collect()
    assert(joined.length == 60)
    joined.foreach { r =>
      assert(r.getAs[String]("got") == r.getAs[String]("want"), r.toString)
      assert(r.getAs[Long]("content_length") == r.getAs[Long]("want_len"))
    }
    // archive stats: all records parse, nothing skipped
    val stats = WarcShards.archiveStats(archives, "warc").collect()
    assert(stats.map(_.getLong(0)).sum == 60L)
    assert(stats.forall(_.getLong(1) == 0L))
  }

  test("shard assembly is byte-deterministic across parallelism — duplicate urls included") {
    import spark.implicits._
    // every url appears TWICE with different timestamps/payloads (a
    // recrawl): a url-only sort would leave the copies' order to shuffle
    // arrival, breaking retry/speculation byte-identity
    val rows = (0L until 40L).flatMap(i => Seq(
      (s"https://g.example/${i % 10}", 1700000000000L + i, "text/plain", s"payload $i".getBytes(UTF_8)),
      (s"https://g.example/${i % 10}", 1700000000000L - i, "text/plain", s"recrawl $i".getBytes(UTF_8))))
    def archive(parallelism: Int): Map[Long, Seq[Byte]] =
      WarcShards.toArchives(
          spark.createDataset(rows).repartition(parallelism)
            .toDF("url", "ts_ms", "ct", "payload"),
          "url", "ts_ms", "ct", "payload", shards = 3, gzip = false)
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(archive(1) == archive(7))
  }

  test("oversized shard fails loudly before materializing") {
    import spark.implicits._
    val rows = Seq(("https://h.example/big", 1L, "t", Array.fill[Byte](2048)(7)))
    val ex = intercept[org.apache.spark.SparkException] {
      WarcShards.toArchives(rows.toDF("url", "ts_ms", "ct", "payload"),
        "url", "ts_ms", "ct", "payload", shards = 1, gzip = false,
        maxShardBytes = 1024L).collect()
    }
    assert(ex.getMessage.contains("raise the shard count") ||
      Option(ex.getCause).exists(_.getMessage.contains("raise the shard count")))
  }

  test("parser fuzz: seeded random garbage never throws; real records embedded in noise survive") {
    val rnd = new scala.util.Random(20260820L)
    // pure-garbage blobs: parse must terminate, never throw, account bytes
    // (a gzip MAGIC with a malformed body deliberately still throws —
    // a corrupt .warc.gz member is task-retry material, not a skip)
    for (_ <- 0 until 200) {
      val junk = new Array[Byte](rnd.nextInt(2048))
      rnd.nextBytes(junk)
      if (junk.length >= 2 && (junk(0) & 0xff) == 0x1f && (junk(1) & 0xff) == 0x8b)
        junk(0) = 0
      val r = Warc.parseArchive(junk)
      assert(r.records.forall(_.payload != null))
      assert(r.skippedBytes >= 0 && r.skippedBytes <= junk.length.toLong)
    }
    // a real record sandwiched in random noise parses out of the wreckage
    for (i <- 0 until 50) {
      val payload = s"survivor $i"
      val rec = Warc.writeArchive(
        Iterator(("https://fuzz.example/" + i, 1700000000000L + i, "text/plain",
          payload.getBytes(UTF_8))), gzip = false)
      val pre = new Array[Byte](rnd.nextInt(256))
      val post = new Array[Byte](rnd.nextInt(256))
      rnd.nextBytes(pre); rnd.nextBytes(post)
      // noise must not accidentally contain the resync magic
      val clean = (b: Array[Byte]) => b.map(x => if (x == 'W'.toByte) '_'.toByte else x)
      val blob = clean(pre) ++ rec ++ clean(post)
      val out = Warc.parseArchive(blob)
      assert(out.records.exists(r =>
        new String(r.payload, UTF_8) == payload), s"record $i lost in noise")
    }
  }

  test("indexed writer: blob identical to plain writer; every span fetches its exact record") {
    for (gzip <- Seq(false, true)) {
      val in = Seq(
        rec("https://i.example/1", 1700000000000L, "text/html", "<html>alpha</html>"),
        rec("https://i.example/2", 1700000000001L, "application/pdf", "%PDF-1.4 beta"),
        rec("https://i.example/3", 1700000000002L, "text/plain", ""),
        rec("https://i.example/4", 1700000000003L, "text/plain",
          "WARC/1.0\r\nContent-Length: 0\r\n\r\ntrap"))
      val (blob, spans) = Warc.writeArchiveIndexed(in.iterator, gzip)
      assert(java.util.Arrays.equals(blob, Warc.writeArchive(in.iterator, gzip)),
        s"indexing must not change the archive (gzip=$gzip)")
      assert(spans.size == in.size)
      // spans tile the blob exactly: contiguous, in order, covering every byte
      assert(spans.head.offset == 0L)
      spans.sliding(2).foreach {
        case Vector(a, b) => assert(a.offset + a.length == b.offset)
        case _ =>
      }
      assert(spans.last.offset + spans.last.length == blob.length.toLong)
      spans.zip(in).foreach { case (s, (url, ts, ct, p)) =>
        val r = Warc.readRecordAt(blob, s.offset, s.length)
        assert(r.url == url && r.dateMs == ts && r.contentType == ct)
        assert(java.util.Arrays.equals(r.payload, p), s"payload (gzip=$gzip) $url")
      }
    }
  }

  test("readRecordAt rejects spans that do not frame exactly one clean record") {
    val in = Seq(
      rec("https://j.example/1", 1700000000000L, "text/plain", "one"),
      rec("https://j.example/2", 1700000000001L, "text/plain", "two"))
    val (blob, spans) = Warc.writeArchiveIndexed(in.iterator, gzip = false)
    // two records in one span
    intercept[IllegalArgumentException] {
      Warc.readRecordAt(blob, 0L, spans(0).length + spans(1).length)
    }
    // span outside the blob
    intercept[IllegalArgumentException] {
      Warc.readRecordAt(blob, spans(1).offset, spans(1).length + 1)
    }
    // misaligned span (starts mid-record)
    intercept[IllegalArgumentException] {
      Warc.readRecordAt(blob, spans(0).offset + 4, spans(0).length - 4)
    }
  }

  test("cdx index + fetchBySpans: point reads return byte-exact payloads; archives never reparse") {
    import spark.implicits._
    val rows = (0L until 50L).map(i => (
      s"https://K${i % 5}.Example.com:443/Path/p$i?x=$i#frag",
      1700000000000L + i, "text/html", s"payload body $i".getBytes(UTF_8)))
    val df = spark.createDataset(rows).toDF("url", "ts_ms", "ct", "payload")
    val archives = WarcShards.toArchivesIndexed(
      df, "url", "ts_ms", "ct", "payload", shards = 3, gzip = true).localCheckpoint()
    val index = WarcShards.cdxIndex(archives)
    assert(index.count() == 50)
    // surt: host lowercased, :443 stripped (https), labels reversed, fragment dropped
    val one = index.where(col("url").contains("/Path/p7?")).collect().head
    assert(one.getAs[String]("surt") == "com,example,k2)/Path/p7?x=7")
    // digest column is the payload md5
    assert(one.getAs[String]("digest") ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("payload body 7".getBytes(UTF_8)).map(b => f"$b%02x").mkString)
    // fetch a deterministic subset through the spans and verify bytes
    val picks = index.where(col("url").rlike("p(3|17|29|41)\\?"))
      .select(col("shard"), col("offset"), col("length"))
    val fetched = WarcShards.fetchBySpans(archives.drop("idx"), picks)
      .select(col("url"), col("warc_ts_ms"),
        col("payload").cast("string").as("body")).collect()
    assert(fetched.length == 4)
    fetched.foreach { r =>
      val i = r.getAs[String]("url").split("/p")(1).split("\\?")(0).toLong
      assert(r.getAs[String]("body") == s"payload body $i")
      assert(r.getAs[Long]("warc_ts_ms") == 1700000000000L + i)
    }
  }

  test("cdxSorted: rows globally ordered by (surt, ts_ms) across range partitions") {
    import spark.implicits._
    val rows = (0L until 40L).map(i => (
      s"https://s${i % 7}.example.org/p${i % 11}", 1700000000000L + i,
      "text/plain", s"b$i".getBytes(UTF_8)))
    val archives = WarcShards.toArchivesIndexed(
      spark.createDataset(rows).toDF("url", "ts_ms", "ct", "payload"),
      "url", "ts_ms", "ct", "payload", shards = 2, gzip = false)
    val sorted = WarcShards.cdxSorted(WarcShards.cdxIndex(archives), partitions = 4)
    val keys = sorted.select(col("surt"), col("ts_ms"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(keys == keys.sorted, "range partitioning + in-partition sort must yield global order")
    assert(keys.size == 40)
  }
}
