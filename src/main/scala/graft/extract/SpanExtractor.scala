package graft.extract

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import graft.model.{FieldRule, Line, Span}

/** Deterministic field→span resolution over layout lines — the from-scratch
  * replacement for the reference's LLM structured-output stage
  * (`/root/reference/src/core/llm_orchestrator.py:122-249`). The ruleset
  * plays the role of the reference's runtime `extraction_schema`
  * (field name → natural-language description); it is broadcast once per job.
  *
  * Resolution rule (frozen; goldens depend on it):
  *  1. keywords per field come in two priority tiers — name-derived
  *     (underscore-split field-name parts) then description-derived — each
  *     lowercased, minus the reference's Portuguese stopword set, keeping
  *     tokens of length > 2: byte-for-byte the keyword derivation of
  *     `filter_layout_by_keywords` (`/root/reference/src/core/extractor.py:327-355`),
  *     split into its two sources;
  *  2. the field resolves to the FIRST line (reading order) containing a
  *     tier-1 keyword as a case-insensitive substring; only if NO line
  *     matches tier 1 is the scan repeated with tier-2 keywords (the
  *     description is the noisier signal — every reference description ends
  *     in "do documento");
  *  3. the matched keyword is the one with the leftmost occurrence in the
  *     line (ties: keyword order); the value is the text after the first `:`
  *     at/after that occurrence, truncated at the next `:`-label boundary and
  *     at the earliest occurrence of any OTHER field's tier-1 keyword (so
  *     `Autor: a-7 Data de emissao: ...` yields `a-7` for `autor`); a match
  *     with no following `:` yields the whole line text;
  *  4. normalization mirrors `_normalize_pydantic_response`
  *     (`/root/reference/src/core/llm_orchestrator.py:218-249`): trim; empty
  *     after trim → unresolved (null value, no span).
  */
object SpanExtractor {

  val Stopwords: Set[String] =
    Set("do", "da", "de", "o", "a", "para", "com", "em", "no", "na", "os", "as")

  private def tokens(s: String): Vector[String] =
    Option(s).getOrElse("").toLowerCase(java.util.Locale.ROOT).split("\\s+").toVector
      .filter(t => t.length > 2 && !Stopwords.contains(t))

  /** Tier-1: field-name-derived keywords. */
  def nameKeywords(rule: FieldRule): Vector[String] =
    tokens(rule.name.replace("_", " ")).distinct

  /** Tier-2: description-derived keywords (minus tier-1 duplicates). */
  def descKeywords(rule: FieldRule): Vector[String] = {
    val t1 = nameKeywords(rule).toSet
    tokens(rule.description).distinct.filterNot(t1)
  }

  /** Combined (reference `filter_layout_by_keywords` order). */
  def keywords(rule: FieldRule): Vector[String] =
    (nameKeywords(rule) ++ descKeywords(rule)).distinct

  /** Leftmost keyword occurrence in `lowered`; ties break on keyword order. */
  private def leftmost(lowered: String, kws: Seq[String]): Option[(Int, String)] = {
    var bestIdx = -1
    var bestKw: String = null
    kws.foreach { k =>
      val i = lowered.indexOf(k)
      if (i >= 0 && (bestIdx < 0 || i < bestIdx)) { bestIdx = i; bestKw = k }
    }
    if (bestIdx < 0) None else Some((bestIdx, bestKw))
  }

  /** Keyword tiers precompiled per rule — pure functions of the RULESET,
    * which is constant per job; deriving them per document made `tokens`
    * the kernel's single hottest frame (15 % of samples: lowercase + regex
    * split + stopword filtering × rules × docs).
    */
  final case class CompiledRule(rule: FieldRule, t1: Vector[String], t2: Vector[String], othersT1: Vector[String])

  /** One job has one ruleset, so a single-slot memo covers the hot path
    * (reference equality first: the broadcast hands every task the same
    * Vector instance, so the per-document lookup is a pointer compare, not
    * a full ruleset rehash). The LRU behind it is BOUNDED — a long-lived
    * session running many distinct rulesets must not accumulate entries
    * forever; 4 slots cover any realistic concurrent-ruleset mix, and an
    * evicted ruleset just recompiles (cheap, correct).
    */
  private val MaxCompiledRulesets = 4

  @volatile private var lastCompiled: (Seq[FieldRule], Vector[CompiledRule]) = null

  private val compiledCache =
    new java.util.LinkedHashMap[Seq[FieldRule], Vector[CompiledRule]](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Seq[FieldRule], Vector[CompiledRule]]): Boolean =
        size() > MaxCompiledRulesets
    }

  private[graft] def compiledCacheSize: Int = compiledCache.synchronized(compiledCache.size())

  def compile(rules: Seq[FieldRule]): Vector[CompiledRule] = {
    val memo = lastCompiled
    if (memo != null && ((memo._1 eq rules) || memo._1 == rules)) return memo._2
    val compiled = compiledCache.synchronized {
      val hit = compiledCache.get(rules)
      if (hit != null) hit
      else {
        val all = rules.toVector
        val built = all.map { rule =>
          CompiledRule(rule, nameKeywords(rule), descKeywords(rule),
            all.filter(_.name != rule.name).flatMap(nameKeywords).distinct)
        }
        compiledCache.put(rules, built)
        built
      }
    }
    lastCompiled = (rules, compiled)
    compiled
  }

  /** Full resolution carrying source-line bboxes. */
  def resolve(rules: Seq[FieldRule], lines: Seq[Line]): Vector[Span] = {
    val lowered = lines.map(l => (l, l.text.toLowerCase(java.util.Locale.ROOT)))
    compile(rules).iterator.flatMap { cr =>
      val rule = cr.rule
      val t1 = cr.t1
      val t2 = cr.t2
      val othersT1 = cr.othersT1

      def firstMatch(kws: Seq[String]): Option[(Line, String, Int, String)] =
        if (kws.isEmpty) None
        else lowered.iterator.flatMap { case (line, lt) =>
          leftmost(lt, kws).map { case (i, k) => (line, lt, i, k) }
        }.nextOption().map { case (line, lt, i, k) => (line, lt, i, k) }

      firstMatch(t1).orElse(firstMatch(t2)) match {
        case Some((line, lt, kwIdx, kw)) =>
          val text = line.text
          val colon = text.indexOf(':', kwIdx + kw.length)
          val v =
            if (colon < 0) text.trim
            else {
              val afterColon = text.substring(colon + 1)
              // cut at the next ":"-label boundary: walk back from the next
              // colon to the start of its label word-group is ambiguous, so
              // the cut is at the earliest other-field tier-1 keyword, then
              // (as a backstop) at the next colon itself.
              val lower = afterColon.toLowerCase(java.util.Locale.ROOT)
              val cutKw = leftmost(lower, othersT1).map(_._1).getOrElse(Int.MaxValue)
              val cutColon = {
                val c = afterColon.indexOf(':')
                if (c < 0) Int.MaxValue else c
              }
              val cut = math.min(math.min(cutKw, cutColon), afterColon.length)
              afterColon.substring(0, cut).trim
            }
          if (v.nonEmpty) Iterator.single(Span(rule.name, v, line.x0, line.y0, line.x1, line.y1))
          else Iterator.empty
        case None => Iterator.empty
      }
    }.toVector
  }

  /** F4 — the reference's keyword layout filter, byte-exact semantics of
    * `filter_layout_by_keywords` (`/root/reference/src/core/extractor.py:308-384`):
    * `maxLines == 0` or empty schema → passthrough; keywords = union of
    * name-parts + description-parts (lowercased, stopwords removed,
    * length > 2); keep lines containing any keyword as a case-insensitive
    * substring; no keywords or no matches → first `maxLines` lines;
    * matched lines truncated to `maxLines`.
    * (Dead in the reference's prod path — config-wired-but-unused, SURVEY
    * §2.4 F4 — but exercised by its test suite, so kept for parity; the
    * production-path generalization is the HTML boilerplate strip.)
    */
  def filterLayoutByKeywords(layoutText: String, rules: Seq[FieldRule], maxLines: Int = 0): String = {
    if (rules.isEmpty || maxLines == 0) return layoutText
    val kws = rules.flatMap(keywords).toSet
    val lines = layoutText.split("\n", -1) // Python split keeps trailing empties
    if (kws.isEmpty) return lines.take(maxLines).mkString("\n")
    val relevant = lines.filter { l =>
      val ll = l.toLowerCase(java.util.Locale.ROOT)
      kws.exists(ll.contains)
    }
    (if (relevant.isEmpty) lines.take(maxLines) else relevant.take(maxLines)).mkString("\n")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  /** Lowercase hex of a digest via table lookup — the idiomatic
    * `f"%02x"`-per-byte formatting costs ~100 ns/byte (a Formatter
    * allocation per byte); at millions of docs/s the hash hex was 18 % of
    * the kernel before this.
    */
  def hexOf(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      val v = d(i) & 0xff
      out(2 * i) = HexChars(v >>> 4)
      out(2 * i + 1) = HexChars(v & 0xf)
      i += 1
    }
    new String(out)
  }

  // one digest instance per executor thread — getInstance per call does a
  // provider lookup + allocation in the hot path
  private val sha256Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("SHA-256"))

  /** SHA-256 hex digest — P1 (`/root/reference/src/core/extractor.py:297-299`). */
  def sha256Hex(bytes: Array[Byte]): String = {
    val md = sha256Local.get()
    md.reset()
    hexOf(md.digest(bytes))
  }

  /** Ruleset hash with the reference's canonical-JSON semantics — P2
    * (`/root/reference/src/core/extractor.py:302-305`): keys sorted,
    * `ensure_ascii=False` (raw UTF-8), Python separators `", "` / `": "`.
    */
  def schemaHash(rules: Seq[FieldRule]): String = {
    val json = rules
      .sortBy(_.name)
      .map(r => s"${jsonStr(r.name)}: ${jsonStr(r.description)}")
      .mkString("{", ", ", "}")
    sha256Hex(json.getBytes(UTF_8))
  }

  private def jsonStr(s: String): String =
    "\"" + Option(s).getOrElse("").flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case '\n'          => "\\n"
      case '\r'          => "\\r"
      case '\t'          => "\\t"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    } + "\""

  /** Cache key — P3 (`/root/reference/src/core/pipeline.py:47`). */
  def cacheKey(label: String, pdfHash: String, schemaHashHex: String): String =
    s"extract:$label:$pdfHash:$schemaHashHex"
}
