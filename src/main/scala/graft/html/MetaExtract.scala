package graft.html

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Page-metadata extraction — the WAT-record analog of a crawl pipeline:
  * alongside the main-content text (WET, [[HtmlTextExtractor]]), a crawl
  * publishes per-page METADATA records (title, meta description, OpenGraph
  * fields, canonical link, declared charset) that feed url consolidation,
  * snippet generation, and quality priors. The reference extracts
  * per-document structured fields from PDFs
  * (`/root/reference/src/core/extractor.py`); this is the html-side
  * structured complement over raw page bytes.
  *
  * Everything here is a pure `Column` regexp expression — codegen'd,
  * map-only, zero exchange; the scan's column pruning and any pushed
  * filters survive untouched. Attribute ORDER and quote style are both
  * hostile inputs on the real web (`<meta content=… name=…>` is common),
  * so every attribute-pair extractor tries both orders, like
  * [[graft.web.UrlOps.metaRobots]].
  *
  * Deliberate boundaries (documented, spec-pinned):
  *  - regex-level tag scanning, not a DOM parse: `[^>]*` never crosses a
  *    tag boundary, so a pattern can only match within one tag — the
  *    standard trade for a codegen-able hot path (the DOM pass lives in
  *    [[HtmlTextExtractor]] where block structure genuinely matters);
  *  - only the five standard named entities (and `&#39;`) are decoded —
  *    full numeric-entity decoding needs a kernel, not a projection;
  *  - first match wins when a page repeats a tag (browsers do the same
  *    for `<title>`).
  */
object MetaExtract {

  /** Decode the five predefined entities + `&#39;`; `&amp;` LAST so
    * `&amp;lt;` decodes to the literal text `&lt;`, not to `<`.
    */
  def decodeEntities(c: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }
  }

  /** Whitespace-normalized, entity-decoded inner text of the first
    * `<title>` tag; empty string when the page has none (regexp_extract's
    * no-match convention — callers filter on `=!= ""`).
    */
  def title(html: Column): Column =
    decodeEntities(trim(regexp_replace(
      regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1), "\\s+", " ")))

  /** Value of `valAttr` on the first `tag` carrying `keyAttr="keyVal"` —
    * either attribute order, either quote style.
    */
  private def tagAttr(html: Column, tag: String, keyAttr: String,
                      keyVal: String, valAttr: String): Column = {
    val fwd = regexp_extract(html,
      s"""(?i)<$tag[^>]*$keyAttr=["']$keyVal["'][^>]*$valAttr=["']([^"']*)["']""", 1)
    val rev = regexp_extract(html,
      s"""(?i)<$tag[^>]*$valAttr=["']([^"']*)["'][^>]*$keyAttr=["']$keyVal["']""", 1)
    decodeEntities(when(fwd =!= "", fwd).otherwise(rev))
  }

  /** `<meta name="…" content="…">` value (description, keywords, …). */
  def metaContent(html: Column, name: String): Column = {
    require(name.matches("[a-zA-Z0-9:._-]+"), s"meta name must be a plain token, got $name")
    tagAttr(html, "meta", "name", name, "content")
  }

  /** `<meta property="og:…" content="…">` OpenGraph value. */
  def ogContent(html: Column, property: String): Column = {
    require(property.matches("[a-zA-Z0-9:._-]+"),
      s"og property must be a plain token, got $property")
    tagAttr(html, "meta", "property", property, "content")
  }

  /** `<link rel="canonical" href="…">` — the url the site itself declares
    * canonical (feeds [[graft.web.UrlOps.urlRevisions]]-style recrawl
    * consolidation as a stronger-than-heuristic signal).
    */
  def canonical(html: Column): Column =
    tagAttr(html, "link", "rel", "canonical", "href")

  /** Declared charset, lowercased: matches both `<meta charset=X>` and the
    * `http-equiv` form's `content="text/html; charset=X"` with one
    * pattern (both spellings end in `charset=` + token, quoted or not).
    */
  def charset(html: Column): Column =
    lower(regexp_extract(html, """(?i)charset\s*=\s*["']?\s*([a-zA-Z0-9_][a-zA-Z0-9_.:-]*)""", 1))
}
