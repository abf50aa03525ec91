package graft.sniff

import java.nio.charset.StandardCharsets.UTF_8

/** Per-row payload routing (north_star: "routed by content sniffing").
  *
  * Generalizes the reference's content-type gate
  * (`/root/reference/src/main.py:402-407`, which trusted the HTTP
  * Content-Type header) into byte-level sniffing, since a crawl table has no
  * trustworthy headers: `%PDF-` magic prefix → PDF; an HTML-ish tag in the
  * first 1 KiB → HTML; otherwise unknown.
  */
object ContentSniffer {
  sealed trait DocType { def name: String }
  case object Pdf extends DocType { val name = "pdf" }
  case object Html extends DocType { val name = "html" }
  case object Unknown extends DocType { val name = "unknown" }

  private val PdfMagic = "%PDF-".getBytes(UTF_8)

  def sniff(bytes: Array[Byte]): DocType = {
    if (bytes == null || bytes.length == 0) return Unknown
    if (bytes.length >= 5 && java.util.Arrays.equals(bytes.take(5), PdfMagic)) return Pdf
    val head = new String(bytes, 0, math.min(bytes.length, 1024), UTF_8).toLowerCase(java.util.Locale.ROOT)
    val t = head.dropWhile(c => c.isWhitespace || c == '﻿')
    if (
      t.startsWith("<!doctype html") || t.startsWith("<html") ||
      head.contains("<html") || head.contains("<head") || head.contains("<body") ||
      head.contains("<!doctype html") || head.contains("<div") || head.contains("<p>") ||
      head.contains("<title")
    ) Html
    else Unknown
  }
}
