package graft.web

import java.util.regex.Pattern

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** robots.txt parsing and url gating — the Robots Exclusion Protocol as a
  * corpus operator (RFC 9309 semantics, the parts that decide real
  * crawls): `User-agent` GROUP selection by longest agent-token match
  * with `*` fallback; `Allow`/`Disallow` path rules with `*` wildcards
  * and the `$` end anchor; decision by LONGEST-pattern match, Allow
  * winning exact ties; no matching rule (or no robots.txt at all) ⇒
  * allowed. This is the fetch-side half of the opt-out story — the
  * page-side half is [[UrlOps.metaRobots]] (`w_robots_gate`), which can
  * only fire AFTER a fetch the robots.txt gate should have prevented.
  *
  * Scale shape: robots bodies are parsed ONCE PER HOST (a slim
  * (host, rules) relation — at 10^8 hosts this is the small side), then
  * the url stream joins it by host and evaluates map-side; compiled rule
  * regexes are cached per host within each task, so a host's rules
  * compile once per partition, not once per url. Hosts without a
  * robots.txt survive via left join (absence allows — the protocol's own
  * default).
  */
object RobotsTxt {

  /** One path rule; `pattern` is the raw robots pattern (may contain `*`
    * and a trailing `$`), `allow` its polarity, `specificity` the
    * pattern's length (the RFC's longest-match tie-break key).
    */
  final case class Rule(allow: Boolean, pattern: String) {
    def specificity: Int = pattern.length
  }

  /** Parse `body` and return the rules of the group governing
    * `userAgent`: groups are runs of `User-agent:` lines followed by
    * rules; the group whose agent token is the LONGEST substring of
    * `userAgent` (case-insensitive) wins, `*` matching with specificity
    * 0. Comments (`#`) and unknown directives are ignored; an empty
    * Disallow ("allow everything", the classic idiom) contributes no
    * rule.
    */
  def parse(body: String, userAgent: String): Seq[Rule] =
    winningGroups(body, userAgent).flatMap(_.rules)

  private final case class Group(agents: Seq[String], rules: Seq[Rule],
                                 crawlDelayMs: Option[Long])

  /** Split into groups and keep only the groups governing `userAgent`:
    * longest matching agent token wins, `*` is the 0-length fallback, and
    * ALL groups tying the winning token contribute (RFC 9309 §2.2.1 —
    * duplicate `User-agent: x` groups split across a hand-edited file are
    * common; taking one group silently dropped the later Disallows).
    */
  private def winningGroups(body: String, userAgent: String): Seq[Group] = {
    if (body == null) return Seq.empty
    val ua = userAgent.toLowerCase
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var delay = Option.empty[Long]
    var inAgents = true
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules, delay)
      agents = Vector.empty; rules = Vector.empty; delay = None; inAgents = true
    }
    body.split("\n").foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val sep = line.indexOf(':')
      if (sep > 0) {
        val directive = line.substring(0, sep).trim.toLowerCase
        val value = line.substring(sep + 1).trim
        directive match {
          case "user-agent" =>
            if (!inAgents) flush() // a new agent line after rules starts a new group
            agents :+= value.toLowerCase
          case "allow" | "disallow" =>
            inAgents = false
            if (value.nonEmpty) rules :+= Rule(directive == "allow", value)
          case "crawl-delay" =>
            // non-standard but ubiquitous; decimal seconds → integer ms
            inAgents = false
            delay = scala.util.Try(
              (BigDecimal(value) * 1000).setScale(0, BigDecimal.RoundingMode.FLOOR)
                .toLongExact).toOption.filter(_ >= 0).orElse(delay)
          case _ => if (!agents.isEmpty) inAgents = false // sitemap etc. end the agent run
        }
      }
    }
    flush()
    val candidates = groups.flatMap { g =>
      g.agents.flatMap {
        case "*" => Some(0 -> g)
        case tok if ua.contains(tok) => Some(tok.length -> g)
        case _ => None
      }
    }
    if (candidates.isEmpty) Seq.empty
    else {
      val win = candidates.map(_._1).max
      candidates.collect { case (s, g) if s == win => g }.toSeq
    }
  }

  /** Non-rule directives: the winning groups' `Crawl-delay` (maximum over
    * combined duplicate groups — the polite merge) and every `Sitemap`
    * url in the file. Sitemap lines are GLOBAL per the sitemaps.org
    * protocol — they apply regardless of which agent group surrounds
    * them, so they are collected from the whole file in order.
    */
  final case class Directives(crawlDelayMs: Option[Long], sitemaps: Seq[String])

  def directives(body: String, userAgent: String): Directives = {
    if (body == null) return Directives(None, Seq.empty)
    val sitemaps = body.split("\n").iterator.flatMap { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val sep = line.indexOf(':')
      if (sep > 0 && line.substring(0, sep).trim.equalsIgnoreCase("sitemap")) {
        val v = line.substring(sep + 1).trim
        if (v.nonEmpty) Some(v) else None
      } else None
    }.toVector
    val delays = winningGroups(body, userAgent).flatMap(_.crawlDelayMs)
    Directives(if (delays.isEmpty) None else Some(delays.max), sitemaps)
  }

  /** Compile a robots pattern: literal prefix match with `*` as any-run
    * and trailing `$` anchoring the end.
    */
  private[web] def compile(pattern: String): Pattern = {
    val anchored = pattern.endsWith("$")
    val core = if (anchored) pattern.dropRight(1) else pattern
    val rx = core.split("\\*", -1).map(Pattern.quote).mkString(".*")
    Pattern.compile("^" + rx + (if (anchored) "$" else ".*"))
  }

  /** A rule with its compiled matcher (compile once, match many). */
  final case class Compiled(allow: Boolean, specificity: Int, rx: Pattern)

  def compileRules(rules: Seq[Rule]): Seq[Compiled] =
    rules.map(r => Compiled(r.allow, r.specificity, compile(r.pattern)))

  /** RFC 9309 decision: among matching rules the longest pattern wins;
    * equal length → Allow wins; nothing matches → allowed.
    */
  def isAllowed(rules: Seq[Rule], path: String): Boolean =
    isAllowedCompiled(compileRules(rules), path)

  def isAllowedCompiled(rules: Seq[Compiled], path: String): Boolean = {
    val matching = rules.filter(_.rx.matcher(path).matches())
    if (matching.isEmpty) true
    else matching.maxBy(r => (r.specificity, r.allow)).allow
  }

  /** Evaluate a url frame against a (host, robots body) frame: every url
    * row comes back with `host` and its `robots_allowed` verdict (callers
    * filter — keeping the flag makes the blocked set auditable). Bodies
    * parse once per host into a slim rules relation; evaluation is
    * map-side after the host join with a per-task compiled-rule cache.
    *
    * Rules match PATH + QUERY (the de-facto REP behavior — Google's
    * reference parser, RFC 9309 lineage — which is what makes the very
    * common wildcard-query rules, "Disallow: slash-star?sessionid=",
    * fire); the FRAGMENT never
    * participates and is stripped BEFORE matching (a `$`-anchored rule
    * must match a fragment-bearing url, and `*` must never match
    * fragment text). Scheme-less inputs are treated as having no
    * authority: the match target starts at their first `/` (or is `/`).
    */
  /** Per-host scheduling directives as a frame: (host, crawl_delay_ms
    * nullable, sitemaps array) — the inputs [[Frontier]]-style politeness
    * scheduling and [[Sitemap]] discovery consume. Map-only over the slim
    * per-host robots relation; zero exchanges.
    */
  def directivesFrame(robots: DataFrame, hostCol: String, bodyCol: String,
                      userAgent: String): DataFrame = {
    val spark = robots.sparkSession
    import spark.implicits._
    robots
      .select(col(hostCol).cast("string").as("host"), col(bodyCol).cast("string").as("body"))
      .as[(String, String)]
      .map { case (h, b) =>
        val d = directives(b, userAgent)
        (h, d.crawlDelayMs, d.sitemaps)
      }
      .toDF("host", "crawl_delay_ms", "sitemaps")
  }

  def gate(urls: DataFrame, urlCol: String,
           robots: DataFrame, hostCol: String, bodyCol: String,
           userAgent: String): DataFrame = {
    val spark = urls.sparkSession
    import spark.implicits._
    val parsed = robots
      .select(col(hostCol).cast("string").as("host"), col(bodyCol).cast("string").as("body"))
      .as[(String, String)]
      .map { case (h, b) => (h, parse(b, userAgent).map(r => (r.allow, r.pattern))) }
      .toDF("host", "rules")
    val withHost = urls.withColumn("host", UrlOps.host(col(urlCol)))
    val joined = withHost.join(parsed, Seq("host"), "left")
    val cols = joined.columns
    val urlIdx = cols.indexOf(urlCol)
    val hostIdx = cols.indexOf("host")
    val rulesIdx = cols.indexOf("rules")
    val schema = org.apache.spark.sql.types.StructType(
      joined.schema.fields.filterNot(_.name == "rules") :+
        org.apache.spark.sql.types.StructField("robots_allowed",
          org.apache.spark.sql.types.BooleanType, nullable = false))
    joined.mapPartitions { it =>
      // a host's rules COMPILE once per task, not once per url
      val cache = scala.collection.mutable.HashMap.empty[String, Seq[Compiled]]
      it.map { row =>
        val allowed = if (row.isNullAt(rulesIdx)) true
        else {
          val host = row.getString(hostIdx)
          val rules = cache.getOrElseUpdate(host,
            compileRules(row.getSeq[org.apache.spark.sql.Row](rulesIdx)
              .map(r => Rule(r.getBoolean(0), r.getString(1)))))
          val u = row.getString(urlIdx)
          val schemeAt = u.indexOf("://")
          val rest = if (schemeAt < 0) u else u.substring(schemeAt + 3)
          // fragment first: '#' may precede '/' (http://host#f/x) and a
          // '/' inside the fragment must not be mistaken for the path
          val hash = rest.indexOf('#')
          val noFrag = if (hash < 0) rest else rest.substring(0, hash)
          val slash = noFrag.indexOf('/')
          val qm = noFrag.indexOf('?')
          // match target = path + query; a path-less query (http://h?x)
          // matches as "/?x", a bare authority as "/"
          val target =
            if (slash < 0 && qm < 0) "/"
            else if (qm >= 0 && (slash < 0 || qm < slash)) "/" + noFrag.substring(qm)
            else noFrag.substring(slash)
          isAllowedCompiled(rules, target)
        }
        val vals = (0 until row.length).filter(_ != rulesIdx).map(row.get) :+ allowed
        org.apache.spark.sql.Row.fromSeq(vals)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
