package graft.web

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL operators for a Common-Crawl-style web corpus: canonicalization,
  * host/registered-domain extraction, and blocklist filtering.
  *
  * A crawl sees the same page under many spellings — mixed-case scheme and
  * host, explicit default ports, tracking query parameters, fragments. A
  * corpus pipeline canonicalizes the url FIRST so that url-keyed dedup,
  * resume anti-joins, and per-domain statistics all operate on one spelling
  * per page. The reference keys its cache on a content hash only
  * (`/root/reference/src/core/pipeline.py:45-47`); at corpus scale the url
  * key must be normalized too, because the same bytes under two url
  * spellings would double both the crawl frontier and the per-domain stats.
  *
  * Everything here is a pure `Column` expression (`lower`, `substring_index`,
  * `regexp_replace`, `when`) — codegen'd, no UDFs, engine-portable. All
  * regexes are lookaround-free so Java regex and RE2 (the DuckDB oracle)
  * agree on every match.
  *
  * Scale shape: canonicalization is a map-only projection (no shuffle);
  * per-domain aggregation shuffles only `(domain, counters)` after map-side
  * partial aggregation; the blocklist is a small broadcast anti-join — the
  * corpus never shuffles for any operator in this file.
  */
object UrlOps {

  /** Cap the corpus at `maxPerDomain` documents per registered domain —
    * the curation gate that stops one mega-domain from dominating a
    * training mix. The kept set is DETERMINISTIC and crawl-order-free:
    * the `maxPerDomain` smallest `md5(id)` values within each domain
    * (hash order, so the subsample is unbiased w.r.t. anything correlated
    * with id or crawl position).
    *
    * Scale shape — the naive formulation (one window over `domain`) makes
    * every mega-domain a hot key: 10^9 rows of one domain funnel through
    * a single partition's sort. This runs an EXACT two-phase top-k
    * instead: phase 1 ranks within (domain, id % subStreams) — key space
    * scales with subStreams — and keeps `maxPerDomain` per sub-stream,
    * which is a correct prefilter (a row among the k smallest of its
    * domain is among the k smallest of any subset containing it); phase 2
    * ranks the ≤ subStreams × maxPerDomain survivors per domain, a
    * bounded input no matter how large the domain. Both phases move only
    * rows that are still candidates.
    */
  /** @param domainOut when set, the registered domain the cap was keyed on
    *                   is kept as an output column under this name — so a
    *                   caller reporting the domain never re-derives it with
    *                   logic that could drift from the capping key.
    */
  def capPerDomain(df: DataFrame, urlCol: String, idCol: String,
                   maxPerDomain: Int, subStreams: Int = 16,
                   domainOut: Option[String] = None): DataFrame = {
    require(maxPerDomain > 0 && subStreams > 0,
      s"maxPerDomain/subStreams must be positive, got $maxPerDomain/$subStreams")
    import org.apache.spark.sql.expressions.Window
    val keyed = df
      .withColumn("graft_dom", registeredDomain(host(col(urlCol))))
      .withColumn("graft_key", md5(col(idCol).cast("string")))
    val pre = Window
      .partitionBy(col("graft_dom"), pmod(col(idCol), lit(subStreams.toLong)))
      .orderBy(col("graft_key"))
    val fin = Window.partitionBy(col("graft_dom")).orderBy(col("graft_key"))
    val capped = keyed
      .withColumn("graft_rn", row_number().over(pre))
      .filter(col("graft_rn") <= maxPerDomain)
      .withColumn("graft_rn", row_number().over(fin))
      .filter(col("graft_rn") <= maxPerDomain)
      .drop("graft_rn", "graft_key")
    domainOut match {
      case Some(name) => capped.withColumnRenamed("graft_dom", name)
      case None       => capped.drop("graft_dom")
    }
  }

  /** Query-string parameters stripped during canonicalization (tracking
    * parameters that do not affect page content). Matched as a whole
    * `&`-delimited token: the class `[^&]*` consumes to the next delimiter,
    * so one linear replace pass removes every occurrence without lookahead.
    */
  val TrackingParamPattern = "&(utm_[^&]*|gclid=[^&]*|fbclid=[^&]*)"

  /** Scheme of the url (lowercased); text before the first `://`. */
  def scheme(u: Column): Column = lower(substring_index(u, "://", 1))

  /** Text after the FIRST `://` — `substring_index(…, -1)` would split at
    * the last occurrence and mis-parse redirect/tracking urls that embed
    * another url in their query (`…/redirect?to=https://other.com/x`).
    */
  private def afterScheme(u: Column): Column =
    when(instr(u, "://") === 0, u)
      .otherwise(u.substr(instr(u, "://") + 3, length(u)))

  private def stripFragment(u: Column): Column = regexp_replace(u, "#.*$", "")

  /** host[:port] part — text between `://` and the first `/` or `?`
    * (a query can follow the authority directly, with no path).
    */
  private def hostPort(u: Column): Column =
    substring_index(substring_index(afterScheme(stripFragment(u)), "/", 1), "?", 1)

  /** Canonical host: lowercased, default port stripped (`:80` for http,
    * `:443` for https); non-default ports are kept.
    */
  def host(u: Column): Column = {
    val h = lower(hostPort(u))
    when(scheme(u) === "https", regexp_replace(h, ":443$", ""))
      .when(scheme(u) === "http", regexp_replace(h, ":80$", ""))
      .otherwise(h)
  }

  /** SURT key (Sort-friendly URI Reordering Transform) — the sort key
    * CDX archive indexes use (Wayback/Common Crawl convention): the
    * canonical host's dot-labels REVERSED and comma-joined, then `)` and
    * the path+query, so every url of a domain — and of its subdomains —
    * sorts adjacently and a prefix range scan answers "everything under
    * example.com". `https://news.example.com/a?q=1` →
    * `com,example,news)/a?q=1`. Scheme and fragment are dropped per the
    * convention; the canonical host (lowercase, default port stripped)
    * feeds the key; path/query case is preserved (content-significant).
    * Pure string expressions, replayed exactly by the SQL oracle.
    */
  def surt(u: Column): Column = {
    val pathq = regexp_replace(afterScheme(stripFragment(u)), "^[^/?]*", "")
    concat(
      array_join(reverse(split(host(u), "\\.")), ","),
      lit(")"),
      when(pathq === "", lit("/")).otherwise(pathq))
  }

  /** URL-structure features — the crawl-prioritization signals a frontier
    * scores BEFORE fetching (no content yet, only the url): `path_depth`
    * (non-empty `/`-segments — shallow pages are hubs/landing pages, deep
    * ones long-tail), `n_params` (query-parameter count — high counts
    * correlate with faceted-search/session churn), and `is_root`. All
    * derived from the fragment-stripped url with the same authority split
    * as [[host]]; map-only string expressions, replayed exactly by the
    * SQL oracle.
    */
  def pathDepth(u: Column): Column = {
    val pathq = regexp_replace(afterScheme(stripFragment(u)), "^[^/?]*", "")
    val path = substring_index(pathq, "?", 1)
    size(filter(split(path, "/"), s => s =!= "")).cast("long")
  }

  def queryParamCount(u: Column): Column = {
    val pathq = regexp_replace(afterScheme(stripFragment(u)), "^[^/?]*", "")
    val q = when(instr(pathq, "?") === 0, lit(""))
      .otherwise(pathq.substr(instr(pathq, "?") + 1, length(pathq)))
    when(q === "", lit(0L)).otherwise(size(split(q, "&")).cast("long"))
  }

  /** Registered domain: the last two dot-labels of the host, with any
    * port stripped first (the canonical host deliberately KEEPS
    * non-default ports, but a blocklist keyed by domain must not let
    * `bad.com:8080` evade a `bad.com` entry). A naive eTLD rule (no
    * public-suffix list in the sandbox) — adequate for grouping synthetic
    * corpora; a production list would swap in here as a broadcast lookup
    * without changing the plan shape.
    */
  def registeredDomain(h: Column): Column =
    regexp_extract(regexp_replace(h, ":[0-9]+$", ""), "([^.]+\\.[^.]+)$", 1)

  /** Canonical url: lowercase scheme+host, default port stripped, fragment
    * removed, tracking query parameters removed (empty query drops its
    * `?`). Path case and non-tracking parameter order are preserved — they
    * are content-significant.
    */
  def canonicalize(u: Column): Column = {
    val rest = afterScheme(stripFragment(u))
    val hp = hostPort(u)
    val pathq = rest.substr(length(hp) + 1, length(rest))
    val path = substring_index(pathq, "?", 1)
    val query = when(pathq.contains("?"),
      pathq.substr(length(path) + 2, length(pathq))).otherwise(lit(""))
    val cleaned = regexp_replace(
      regexp_replace(concat(lit("&"), query, lit("&")), TrackingParamPattern, ""),
      "^&+|&+$", "")
    concat(scheme(u), lit("://"), host(u), path,
      when(cleaned === "", lit("")).otherwise(concat(lit("?"), cleaned)))
  }

  /** Per-registered-domain corpus statistics: page count, distinct hosts,
    * and a caller-supplied boolean quality column counted per domain — the
    * aggregate a crawl-curation step ranks and prunes domains by.
    *
    * Scale: map-side partial agg on a low-cardinality string key; only
    * `(domain, partial counters)` shuffle. `count_distinct(host)` is the
    * one expand-shuffle (exact distinct-per-key is inherently two-phase);
    * hosts are short strings and domains are few, so the exchange is tiny
    * relative to the corpus.
    */
  def domainStats(df: DataFrame, urlCol: String, qualityCol: String): DataFrame = {
    val h = host(col(urlCol))
    df.select(registeredDomain(h).as("domain"), h.as("host"), col(qualityCol))
      .groupBy(col("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        sum(when(col(qualityCol), 1L).otherwise(0L)).as("n_quality"))
  }

  /** Bayesian-smoothed per-domain quality prior — the crawl-prioritization
    * score a frontier ranks candidate domains by. The raw quality rate is
    * useless for scheduling at web scale: most domains have a handful of
    * fetched pages, and a 1-of-1 domain would outrank a 9000-of-10000 one.
    * The standard fix is additive smoothing toward the GLOBAL rate:
    *
    *   prior_ppm = (n_quality·10^6 + α·global_ppm) DIV (n_docs + α)
    *
    * i.e. every domain starts with α pseudo-observations at the corpus
    * mean and earns its own rate as evidence accumulates. All integer
    * arithmetic (positive operands, DIV) — engine-exact.
    *
    * Scale shape: rides [[domainStats]]'s map-side partial agg; the global
    * rate is a ONE-ROW aggregate broadcast back over the slim per-domain
    * rows. Nothing document-sized moves.
    */
  def domainPriors(df: DataFrame, urlCol: String, qualityCol: String,
                   alpha: Int = 20): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val stats = domainStats(df, urlCol, qualityCol)
    val g = stats.agg(sum(col("n_quality")).as("tq"), sum(col("n_docs")).as("td"))
    stats.crossJoin(broadcast(g))
      .withColumn("global_ppm", expr("tq * 1000000 div td"))
      .withColumn("prior_ppm",
        expr(s"(n_quality * 1000000 + $alpha * global_ppm) div (n_docs + $alpha)"))
      .select(col("domain"), col("n_docs"), col("n_quality"),
        col("global_ppm"), col("prior_ppm"))
  }

  /** Drop rows whose registered domain is on the blocklist. The blocklist
    * (spam/adult/boilerplate domains — thousands of rows in production) is
    * built as a DataFrame and broadcast anti-joined, so the corpus side is
    * a map-only probe: no corpus shuffle, no `isin` literal explosion in
    * the plan.
    */
  def dropBlockedDomains(df: DataFrame, urlCol: String, blocked: DataFrame): DataFrame = {
    val withDomain = df.withColumn("domain", registeredDomain(host(col(urlCol))))
    withDomain.join(broadcast(blocked.select(col("domain"))), Seq("domain"), "left_anti")
  }

  /** Canonical-url revision statistics — the recrawl-consolidation step:
    * a crawl fetches the same page across dumps under varying spellings
    * (tracking params, fragments, case), so consolidation groups by the
    * CANONICAL url and reports, per page: how many times it was fetched
    * (`n_fetches`), how many distinct content versions those fetches saw
    * (`n_versions` — content drift), and the latest fetch's id and
    * fingerprint (`latest_id`/`latest_fp`, latest-wins by `idCol` —
    * crawl ids are fetch-ordered). Downstream dedup keeps `latest_fp`;
    * `n_versions > 1` feeds recrawl scheduling (volatile pages get
    * shorter revisit intervals).
    *
    * Scale shape: one exchange of slim (canon_url, id, fp) triples with
    * map-side partial aggregation; payloads never move. The distinct
    * count is per-group two-phase, never a global distinct.
    */
  def urlRevisions(df: DataFrame, urlCol: String, idCol: String, fpCol: String): DataFrame =
    df.select(canonicalize(col(urlCol)).as("canon_url"), col(idCol), col(fpCol))
      .groupBy(col("canon_url"))
      .agg(
        count(lit(1)).as("n_fetches"),
        countDistinct(col(fpCol)).as("n_versions"),
        max(col(idCol)).as("latest_id"),
        max_by(col(fpCol), col(idCol)).as("latest_fp"))

  /** Change-rate-driven recrawl scheduling (the Cho & Garcia-Molina 2003
    * refresh-policy family): a crawler with a fixed fetch budget should
    * revisit pages in proportion to how often they actually change, not
    * uniformly — news front pages hourly, archived pages yearly. Built on
    * [[urlRevisions]]' fetch history:
    *
    *   change_ppm = (n_versions − 1)·10^6 DIV max(n_fetches − 1, 1)
    *     — the fraction of REFETCHES that observed new content (1 fetch ⇒
    *       no evidence ⇒ 0)
    *   interval_h = clamp(baseHours·10^6 DIV max(change_ppm, 1),
    *                      baseHours, maxHours)
    *     — revisit interval inversely proportional to the observed change
    *       rate: always-changing pages at baseHours, never-changing pages
    *       at the maxHours ceiling
    *   tier       = hot (≥ 50 %) / warm (≥ 10 %) / cold — the frontier's
    *       coarse scheduling classes
    *
    * All positive-integer arithmetic (DIV) — engine-exact.
    *
    * Scale shape: rides urlRevisions' single slim (canon_url, id, fp)
    * exchange; the schedule itself is a map-only projection over the
    * per-url aggregate rows.
    */
  def recrawlSchedule(df: DataFrame, urlCol: String, idCol: String, fpCol: String,
                      baseHours: Int = 6, maxHours: Int = 720): DataFrame = {
    require(baseHours > 0 && maxHours >= baseHours,
      s"need 0 < baseHours <= maxHours, got $baseHours/$maxHours")
    urlRevisions(df, urlCol, idCol, fpCol)
      .withColumn("change_ppm",
        expr("(n_versions - 1) * 1000000 div greatest(n_fetches - 1, 1)"))
      .withColumn("interval_h",
        least(lit(maxHours.toLong),
          greatest(lit(baseHours.toLong),
            expr(s"$baseHours * 1000000 div greatest(change_ppm, 1)"))).cast("long"))
      .withColumn("tier",
        when(col("change_ppm") >= 500000L, "hot")
          .when(col("change_ppm") >= 100000L, "warm")
          .otherwise("cold"))
      .select(col("canon_url"), col("n_fetches"), col("n_versions"),
        col("change_ppm"), col("tier"), col("interval_h"))
  }

  /** True iff the page's markup carries `<meta name="robots">` with the
    * given directive (`noindex` / `nofollow` / `noarchive` …) — the
    * publisher opt-out a compliant training-data crawl honors before
    * anything else touches the page. Both attribute orders are matched
    * (name-first and content-first), either quote style, case-insensitive.
    * Map-only codegen'd regexes (lookaround-free; negated classes bound
    * each match to a single tag), so the gate composes with the scan —
    * opted-out payloads can be dropped before they ever shuffle.
    */
  def metaRobots(html: Column, directive: String): Column = {
    require(directive.matches("[a-z-]+"), s"directive must be a plain token, got $directive")
    val h = lower(html)
    // the directive must be a whole comma/space-separated TOKEN of the
    // content attribute, not a substring: "index" is a substring of
    // "noindex"/"noimageindex", so a bare-substring match inverts the gate
    // on exactly the pages that opted out
    val tok = s"""(|[^"']*[ ,])$directive([ ,][^"']*|)["']"""
    h.rlike(s"""<meta[^>]*name=["']robots["'][^>]*content=["']$tok""") ||
      h.rlike(s"""<meta[^>]*content=["']$tok[^>]*name=["']robots["']""")
  }
}
