package graft.html

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Charset-routed payload decoding — the step between raw crawl BYTES and
  * every text operator in the engine. A crawled page's encoding is
  * whatever its `<meta charset>` / http-equiv declaration says, and the
  * declaration lives INSIDE the bytes being decoded; the standard
  * (WHATWG-prescan) escape from that circularity, and what browsers do,
  * is: decode the bytes as ISO-8859-1 first (a lossless byte→char view —
  * every byte maps, nothing throws), sniff the declaration out of that
  * view with [[MetaExtract.charset]] (meta tags are ASCII, identical in
  * both views), then decode properly per the declaration.
  *
  * Routing (pure `Column` expressions, fully codegen'd — Spark's builtin
  * `decode` handles the charsets a crawl overwhelmingly sees):
  *  - `utf-8` / `utf8`, or NO declaration → UTF-8 (the web default;
  *    WHATWG says assume UTF-8 absent other signals);
  *  - `iso-8859-1` / `latin-1` / `l1` → the prescan view IS the decode;
  *  - `us-ascii` / `ascii` → UTF-8 (ASCII is a strict subset — one fewer
  *    branch with identical results for conforming payloads);
  *  - anything else (shift_jis, windows-125x, …) → the prescan view,
  *    flagged `charset_known = false` so the caller can quarantine
  *    instead of silently mangling (latin-1 is the information-
  *    preserving fallback: bytes survive for a later re-decode).
  */
object CharsetDecode {

  private def prescan(payload: Column): Column = decode(payload, "ISO-8859-1")

  /** Declared charset sniffed from the latin-1 prescan ('' if none). */
  def sniffCharset(payload: Column): Column = MetaExtract.charset(prescan(payload))

  private val Utf8Names = Seq("", "utf-8", "utf8")
  private val Latin1Names = Seq("iso-8859-1", "latin-1", "latin1", "l1")
  private val AsciiNames = Seq("us-ascii", "ascii")

  /** True iff the declared charset routes to a real decoder here. */
  def charsetKnown(payload: Column): Column =
    sniffCharset(payload).isin(Utf8Names ++ Latin1Names ++ AsciiNames: _*)

  /** The routed text decode. */
  def decodeRouted(payload: Column): Column = {
    val cs = sniffCharset(payload)
    when(cs.isin(Utf8Names ++ AsciiNames: _*), decode(payload, "UTF-8"))
      .otherwise(prescan(payload)) // latin-1 family AND the unknown fallback
  }
}
