package graft.web

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sitemap parsing (the sitemaps.org protocol): the crawler's OTHER
  * discovery input besides the link graph — site owners enumerate the
  * urls they WANT crawled, with optional freshness hints. Completes the
  * crawl-discovery family (robots.txt gate, frontier scheduling, outlink
  * harvest); a production frontier unions sitemap entries with harvested
  * links and lets the politeness scheduler arbitrate.
  *
  * Subset implemented: `<url>` blocks with `<loc>` (required; entries
  * without one are dropped per the protocol) and `<lastmod>` (optional;
  * empty string when absent — kept a string because sitemap lastmod is
  * W3C datetime with several legal precisions). Parsing is regex-over-
  * blocks, deliberately: the protocol's structure is flat and the
  * patterns are lookaround-free and lazy-quantified, so Java regex and
  * RE2 (DuckDB) walk identical matches — full XML parsing would buy
  * nothing but an engine-parity hazard (and entity handling the protocol
  * forbids anyway: urls must be entity-escaped, which [[entries]]
  * deliberately leaves as-is for the consumer's canonicalizer).
  *
  * Scale shape: map-only — one projection with two regex passes per
  * block over each sitemap payload; no exchange anywhere. Sitemaps are
  * bounded by protocol (50k urls / 50 MB each), so per-row work is
  * bounded; the url stream feeds the same slim url-keyed ops as the
  * harvested-link stream.
  */
object Sitemap {

  /** Explode sitemap XML into (idCol, pos, loc, lastmod) — one row per
    * `<url>` block carrying a non-empty `<loc>`, 0-based position
    * preserving document order, `lastmod` empty when absent.
    */
  def entries(df: DataFrame, idCol: String, xmlCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(regexp_extract_all(col(xmlCol),
          lit("(?s)<url>(.*?)</url>"), lit(1))).as(Seq("pos", "block")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        regexp_extract(col("block"), "<loc>([^<]*)</loc>", 1).as("loc"),
        regexp_extract(col("block"), "<lastmod>([^<]*)</lastmod>", 1).as("lastmod"))
      .where(col("loc") =!= "")

  /** Unified discovery over a fetched sitemap payload of EITHER protocol
    * shape: `<urlset>` page entries come back as kind `url`, and
    * `<sitemapindex>` child references (the 50k-url/50MB overflow
    * mechanism big sites use — one index pointing at many sitemaps) come
    * back as kind `sitemap`. The crawler loop is fetch → discover →
    * enqueue `url` rows to the frontier, fetch `sitemap` rows and
    * discover again; the protocol forbids indexes referencing indexes,
    * so the loop terminates after one nesting level by spec. A payload
    * contains one shape or the other, so the two passes never
    * double-count (an index block has no `<url>` tags and vice versa).
    *
    * Same scale shape as [[entries]]: map-only regex-over-blocks, no
    * exchange; the union is of two projections over the same scan.
    */
  def discover(df: DataFrame, idCol: String, xmlCol: String): DataFrame = {
    def parse(tag: String, kind: String): DataFrame =
      df.select(col(idCol),
          posexplode(regexp_extract_all(col(xmlCol),
            lit(s"(?s)<$tag>(.*?)</$tag>"), lit(1))).as(Seq("pos", "block")))
        .select(col(idCol), lit(kind).as("kind"), col("pos").cast("long").as("pos"),
          regexp_extract(col("block"), "<loc>([^<]*)</loc>", 1).as("loc"),
          regexp_extract(col("block"), "<lastmod>([^<]*)</lastmod>", 1).as("lastmod"))
        .where(col("loc") =!= "")
    parse("url", "url").unionAll(parse("sitemap", "sitemap"))
  }
}
