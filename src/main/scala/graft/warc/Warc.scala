package graft.warc

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import scala.collection.mutable.ArrayBuffer

/** WARC (Web ARChive, ISO 28500) record framing — the container format
  * Common Crawl actually ships, and therefore the on-disk input a
  * crawl-scale extraction job really reads before anything relational
  * exists. The reference consumes one uploaded document per request
  * (`/root/reference/src/main.py:402`); this layer is the corpus-scale
  * ingestion complement: billions of records framed inside ~1 GB archive
  * files, each record its own gzip member in the `.warc.gz` variant so
  * readers can split without decompressing the world.
  *
  * Subset implemented (the load-bearing core of ISO 28500 / the WARC 1.1
  * spec, written from the published format description):
  *  - record = version line `WARC/1.0` CRLF, header lines `Name: value`
  *    CRLF, blank CRLF, exactly `Content-Length` payload bytes, then the
  *    mandated two CRLF record separators;
  *  - header names case-insensitive; payload framing is BY LENGTH ONLY —
  *    a payload containing literal `WARC/1.0` text must survive (tested);
  *  - `.warc.gz`: each record an independent gzip member, members
  *    concatenated ([[GZIPInputStream]] walks multi-member streams, and
  *    length framing makes member boundaries irrelevant to the parser);
  *  - lenient resync: damaged bytes between records are skipped by
  *    scanning to the next `WARC/` magic, counted in
  *    [[ParseResult.skippedBytes]] — one corrupt record must never kill
  *    an archive-sized task.
  *
  * Determinism: the writer derives `WARC-Record-ID` from the target URI
  * (no randomness, no clock) and formats `WARC-Date` from the supplied
  * epoch — same input, byte-identical archive at any parallelism, which
  * is what lets round trips be value-gated end to end.
  *
  * Scale shape (10^12 records): archives are PER-SHARD blobs — assembly
  * is one shard-keyed exchange (records ordered within shard for byte
  * determinism), parsing is map-only per blob and allocates only the
  * current record. Real deployments read one archive file per input
  * split (`binaryFile` source) and stream it; this in-memory byte-array
  * surface is the same framing logic with the shard bounded by
  * `maxShardBytes` at write time.
  */
object Warc {

  /** One parsed record. `dateMs` is the WARC-Date epoch; `payload` is the
    * exact Content-Length byte slice.
    */
  final case class WarcRecord(url: String, dateMs: Long, recordType: String,
                              contentType: String, payload: Array[Byte])

  final case class ParseResult(records: Vector[WarcRecord], skippedBytes: Long)

  private val Crlf = "\r\n"
  private val DateFmt = java.time.format.DateTimeFormatter.ISO_INSTANT

  private def fmtDate(ms: Long): String =
    DateFmt.format(java.time.Instant.ofEpochMilli(ms))

  private def parseDate(s: String): Long =
    java.time.Instant.from(DateFmt.parse(s)).toEpochMilli

  /** Record id derived from the target URI — deterministic by design
    * (real writers use fresh UUIDs; determinism is what makes the round
    * trip gateable, and the spec only asks for uniqueness).
    */
  def recordId(url: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(url.getBytes(UTF_8))
    val hex = md.map(b => f"$b%02x").mkString
    s"<urn:graft:${hex}>"
  }

  /** CR/LF can never reach a header line: a crawled url is hostile input,
    * and an embedded "\r\nContent-Length: 0" would hijack the framing of
    * its own record (the parser's first-match header lookup would read
    * the injected length). Urls percent-encode the two bytes (legal URI
    * encoding, information-preserving); other header values drop them.
    */
  private def headerSafeUrl(s: String): String =
    s.replace("\r", "%0D").replace("\n", "%0A")
  private def headerSafe(s: String): String =
    s.filterNot(c => c == '\r' || c == '\n')

  /** Serialize one record (uncompressed framing). */
  def writeRecord(out: ByteArrayOutputStream, url: String, dateMs: Long,
                  contentType: String, payload: Array[Byte],
                  recordType: String = "response"): Unit = {
    val header = new StringBuilder()
      .append("WARC/1.0").append(Crlf)
      .append("WARC-Type: ").append(headerSafe(recordType)).append(Crlf)
      .append("WARC-Target-URI: ").append(headerSafeUrl(url)).append(Crlf)
      .append("WARC-Date: ").append(fmtDate(dateMs)).append(Crlf)
      .append("WARC-Record-ID: ").append(recordId(url)).append(Crlf)
      .append("Content-Type: ").append(headerSafe(contentType)).append(Crlf)
      .append("Content-Length: ").append(payload.length).append(Crlf)
      .append(Crlf)
    out.write(header.toString.getBytes(UTF_8))
    out.write(payload)
    out.write((Crlf + Crlf).getBytes(UTF_8))
  }

  /** Serialize records into one archive blob; `gzip = true` makes each
    * record its own gzip member (the `.warc.gz` layout).
    */
  def writeArchive(records: Iterator[(String, Long, String, Array[Byte])],
                   gzip: Boolean): Array[Byte] =
    writeArchiveIndexed(records, gzip)._1

  /** One index entry of [[writeArchiveIndexed]]: the byte span inside the
    * archive blob that [[readRecordAt]] retrieves without touching any
    * other byte. For gzip archives the span is the record's own gzip
    * MEMBER (compressed bytes — what real CDX `offset`/`length` columns
    * point at in a `.warc.gz`); for plain archives it is the framed
    * record including its trailing separators.
    */
  final case class RecordSpan(url: String, dateMs: Long, offset: Long, length: Long)

  /** [[writeArchive]] plus the per-record byte spans — the raw material
    * of a CDX index. Byte-for-byte identical blob to [[writeArchive]]
    * (the non-indexed form delegates here), so indexing an archive never
    * changes the archive.
    */
  def writeArchiveIndexed(records: Iterator[(String, Long, String, Array[Byte])],
                          gzip: Boolean): (Array[Byte], Vector[RecordSpan]) = {
    val out = new ByteArrayOutputStream(1 << 16)
    val spans = Vector.newBuilder[RecordSpan]
    records.foreach { case (url, dateMs, contentType, payload) =>
      val start = out.size.toLong
      if (gzip) {
        val member = new ByteArrayOutputStream(payload.length + 256)
        writeRecord(member, url, dateMs, contentType, payload)
        val compressed = new ByteArrayOutputStream(payload.length / 2 + 64)
        val gz = new GZIPOutputStream(compressed)
        gz.write(member.toByteArray)
        gz.close() // full close releases the Deflater; sink is ours
        compressed.writeTo(out)
      } else writeRecord(out, url, dateMs, contentType, payload)
      spans += RecordSpan(url, dateMs, start, out.size.toLong - start)
    }
    (out.toByteArray, spans.result())
  }

  /** Random access: parse exactly the record whose span a CDX row points
    * at, touching `length` bytes of the blob and nothing else — the read
    * path that makes a 100 TB archive store usable for point lookups
    * (fetch one url's payload without inflating the enclosing ~1 GB
    * archive). Fails loudly on a span that does not frame exactly one
    * clean record: a CDX row disagreeing with its archive is corruption,
    * not something to resync over.
    */
  def readRecordAt(archive: Array[Byte], offset: Long, length: Long): WarcRecord = {
    require(offset >= 0 && length > 0 && offset + length <= archive.length,
      s"span [$offset, +$length) outside archive of ${archive.length} bytes")
    val slice = java.util.Arrays.copyOfRange(
      archive, offset.toInt, (offset + length).toInt)
    val r = parseArchive(slice)
    require(r.records.size == 1 && r.skippedBytes == 0L,
      s"span [$offset, +$length) framed ${r.records.size} records with " +
        s"${r.skippedBytes} skipped bytes; expected exactly one clean record")
    r.records.head
  }

  private def gunzipAll(bytes: Array[Byte], maxBytes: Int): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 1 << 16)
    // long math: bytes.length * 4 overflows Int past ~512 MiB archives
    val out = new ByteArrayOutputStream(
      math.min(bytes.length.toLong * 4, maxBytes.toLong).toInt)
    val buf = new Array[Byte](1 << 16)
    var n = in.read(buf)
    var total = 0L
    while (n >= 0) {
      total += n
      require(total <= maxBytes, s"archive inflates past $maxBytes bytes")
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    out.toByteArray
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  private val Magic = "WARC/".getBytes(UTF_8)
  private val HeaderEnd = (Crlf + Crlf).getBytes(UTF_8)

  /** Parse an archive blob (gzip auto-detected by magic bytes). Framing is
    * strictly by Content-Length; bytes that do not start a well-formed
    * record are skipped up to the next `WARC/` magic and counted.
    */
  def parseArchive(bytes: Array[Byte],
                   maxInflatedBytes: Int = 1 << 30): ParseResult = {
    val data =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
        gunzipAll(bytes, maxInflatedBytes)
      else bytes
    val records = Vector.newBuilder[WarcRecord]
    var skipped = 0L
    var pos = 0
    while (pos < data.length) {
      val at = indexOf(data, Magic, pos)
      if (at < 0) { skipped += data.length - pos; pos = data.length }
      else {
        skipped += at - pos
        parseOne(data, at) match {
          case Some((rec, next)) => records += rec; pos = next
          case None =>
            // damaged header/truncated payload: resync past this magic
            skipped += Magic.length
            pos = at + Magic.length
        }
      }
    }
    ParseResult(records.result(), skipped)
  }

  /** Parse one record at `at` (which points at `WARC/`). Returns the
    * record plus the offset just past its trailing separators, or None if
    * the framing is damaged.
    */
  private def parseOne(data: Array[Byte], at: Int): Option[(WarcRecord, Int)] = {
    val hEnd = indexOf(data, HeaderEnd, at)
    if (hEnd < 0) return None
    val headerText = new String(data, at, hEnd - at, UTF_8)
    val lines = headerText.split("\r\n")
    if (!lines.headOption.exists(_.startsWith("WARC/"))) return None
    val kv = new ArrayBuffer[(String, String)](lines.length)
    lines.iterator.drop(1).foreach { l =>
      val i = l.indexOf(':')
      if (i > 0) kv += ((l.substring(0, i).trim.toLowerCase, l.substring(i + 1).trim))
    }
    def h(name: String): Option[String] = kv.collectFirst { case (`name`, v) => v }
    val lenOpt = h("content-length").flatMap(s => scala.util.Try(s.toLong).toOption)
    val urlOpt = h("warc-target-uri")
    val dateOpt = h("warc-date").flatMap(s => scala.util.Try(parseDate(s)).toOption)
    (lenOpt, urlOpt, dateOpt) match {
      case (Some(len), Some(url), Some(dateMs))
          if len >= 0 && len <= data.length - (hEnd + HeaderEnd.length) =>
        val start = hEnd + HeaderEnd.length
        val payload = java.util.Arrays.copyOfRange(data, start, start + len.toInt)
        // the spec mandates two CRLFs after the payload; tolerate their
        // absence at end-of-blob (truncated final record separator)
        var next = start + len.toInt
        var seps = 0
        while (seps < 2 && next + 1 < data.length &&
            data(next) == '\r' && data(next + 1) == '\n') {
          next += 2; seps += 1
        }
        Some((WarcRecord(url, dateMs,
          h("warc-type").getOrElse(""), h("content-type").getOrElse(""), payload), next))
      case _ => None
    }
  }
}
