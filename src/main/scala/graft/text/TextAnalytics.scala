package graft.text

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, document fingerprinting, quality scoring, and a
  * deterministic language-ID heuristic.
  *
  * Everything here is a pure `Column` expression built from
  * `org.apache.spark.sql.functions` — no UDFs — so every operator stays
  * inside whole-stage codegen and is pushdown/pruning-friendly. Each
  * function doubles as a DuckDB-oracle-checkable relational op (see
  * `graft.SparkEntry.oracleSql`): the expressions use only arithmetic whose
  * semantics are engine-portable (integer counts, md5/sha256 hex, plain
  * string replacement), never float division.
  *
  * Generalizes the reference's only text heuristics — the keyword layout
  * filter (`/root/reference/src/core/extractor.py:308-384`) and the
  * token-count observability metric
  * (`/root/reference/src/core/llm_orchestrator.py:98-119`) — to corpus-level
  * operators.
  */
object TextAnalytics {

  /** Whitespace tokens of the trimmed text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Token count; 0 for empty/blank text (split("") would yield [""]). */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0)).otherwise(size(tokens(c)))

  /** BPE-style pretokenizer pattern: alphabetic runs, digit groups of at
    * most 3 (modern BPE vocabularies split long numbers exactly this
    * way), and single non-alphanumeric marks. Deliberately
    * lookahead-free so Java regex and RE2 (DuckDB) agree on every
    * non-overlapping left-to-right match; a real tokenizer would apply a
    * merges table AFTER this split — the pretokenizer is the part that
    * determines corpus-scale token statistics.
    */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\\s]"

  /** Token count under [[BpeTokenPattern]] — the "BPE-ish" estimate of
    * what a subword tokenizer would charge for the text (vs the
    * whitespace count, which undercounts punctuation-dense and
    * number-dense documents).
    */
  def bpeTokenCount(c: Column): Column =
    regexp_count(c, lit(BpeTokenPattern)).cast("long")

  /** Per-document out-of-vocabulary rate against the corpus's own top-K
    * (case-folded, whitespace) token vocabulary — the "how much of this
    * page will a fixed tokenizer vocabulary actually cover" signal a
    * training pipeline budgets against (high OOV ⇒ boilerplate symbol
    * soup, wrong language, or mojibake; cf. the vocabulary-coverage
    * filters in CCNet/C4 lineage). Output per document:
    * `(id, n_tokens, n_oov, oov_ppm)` with `oov_ppm = n_oov · 10^6 DIV
    * n_tokens` (0 for empty docs), all integer.
    *
    * Scale shape: the vocabulary is ONE slim token-key aggregate with
    * map-side partials into a TakeOrdered(K) (never a full sort), K
    * driver-bounded at ≤ 65536 — vocabulary-sized, the canonical
    * broadcast-side relation. The probe is MAP-ONLY and O(log K) per
    * token: the vocabulary becomes a SINGLE sorted `array<string>`
    * literal (one Literal node — the expression tree stays O(1) in K,
    * unlike a CreateArray of K children) probed by the native
    * codegen'd binary search [[graft.functions.SortedContainsExpression]]
    * — 15 comparisons per token at a production 32k vocabulary where
    * `array_contains` scans all 32768. An EMPTY corpus yields an empty
    * typed literal (every token OOV), not an analysis error.
    * Documents never shuffle; the corpus is scanned twice (vocab +
    * probe), which at 10^12 rows is the honest minimum for a
    * corpus-relative vocabulary — pin the vocab once and re-probe
    * incrementally for recurring runs.
    */
  def oovStats(df: DataFrame, idCol: String, textCol: String,
               vocabSize: Int = 1024): DataFrame = {
    require(vocabSize >= 1 && vocabSize <= 65536,
      s"vocabSize must be in [1, 65536], got $vocabSize")
    val toksOf: Column => Column = c =>
      when(length(trim(c)) === 0, array().cast("array<string>"))
        .otherwise(split(trim(lower(c)), "\\s+"))
    val vocab = df
      .select(explode(toksOf(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
      .orderBy(desc("tf"), asc("token")) // deterministic under tf ties
      .limit(vocabSize)
      .select(col("token")).collect().map(_.getString(0))
    // sorted in UTF8String (UTF-8 byte) order — the binary-search probe's
    // contract; `lit` on the empty array still types as array<string>
    graft.functions.GraftFunctions.register(df.sparkSession)
    val vlit = lit(graft.functions.SortedContains.sorted(vocab.toSeq))
    val inVocab: Column => Column = t => call_function(
      graft.functions.GraftFunctions.SortedContainsName, vlit, t)
    df.select(col(idCol),
        tokenCount(col(textCol)).cast("long").as("n_tokens"),
        size(filter(toksOf(col(textCol)), t => not(inVocab(t))))
          .cast("long").as("n_oov"))
      .select(col(idCol), col("n_tokens"), col("n_oov"),
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(expr("n_oov * 1000000 DIV n_tokens")).as("oov_ppm"))
  }

  /** Per-document keyphrases: the top-`k` terms by TF-IDF — the light
    * document-labeling signal (topic facets, cluster names, index
    * previews) a corpus card surfaces per page. The score is the
    * integer surrogate `tf · 10^6 DIV df`: within one document the
    * corpus size N is constant, so ranking by `tf/df` is ranking by
    * `tf · (N/df)` — classic TF-IDF up to the shared factor — while
    * staying DIV-exact and engine-portable (a float `ln(N/df)` would
    * rank near-identically but defeat the value-exact oracle). Ties →
    * term ascending. Case-folded whitespace terms, like the vocabulary
    * ops.
    *
    * Output: one row per (id, rank) with the term, tf, df, score_ppm.
    *
    * Scale shape: tf is one (id, term) aggregate with map-side
    * partials; df is one term-keyed aggregate of the DISTINCT (id,
    * term) slims (it falls out of the same relation); the join back is
    * term-keyed (df is vocabulary-bounded — AQE broadcasts it); the
    * top-k window partitions by DOCUMENT, so no global sort exists
    * anywhere. Text never shuffles — only slim term rows.
    */
  def keyphrases(df: DataFrame, idCol: String, textCol: String,
                 k: Int = 3): DataFrame = {
    require(k >= 1 && k <= 100, s"k must be in [1, 100], got $k")
    val toks = when(length(trim(col(textCol))) === 0, array().cast("array<string>"))
      .otherwise(split(trim(lower(col(textCol))), "\\s+"))
    val tf = df.select(col(idCol).as("id"), explode(toks).as("term"))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("score_ppm").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .select(col("id"), col("term"), col("tf"), col("df"),
        expr("tf * 1000000 DIV df").as("score_ppm"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("term"), col("tf"), col("df"), col("score_ppm"))
  }

  /** Fixed English stopword list for the quality-signal ratio (the
    * C4/Gopher-style rule "a natural-language document contains common
    * function words"; Gopher's published form requires ≥ 2 of a small
    * stop set). Full words only — the regex wraps them in `\b`, so
    * prefix shadowing in the alternation is harmless.
    */
  val EnStopwords: Seq[String] = Seq(
    "the", "be", "to", "of", "and", "a", "in", "that", "have", "it",
    "is", "was", "for", "on", "are", "with", "as", "at")

  private val stopPattern = "\\b(?:" + EnStopwords.mkString("|") + ")\\b"

  /** Exact count of stopword TOKENS (word-boundary regex count over the
    * lowercased text — unlike [[markerMass]]'s replace arithmetic,
    * adjacent stopwords are counted exactly because `\b` consumes no
    * characters). Lookahead-free ASCII pattern: Java regex and RE2
    * (DuckDB) count identical matches.
    */
  def stopTokenCount(c: Column): Column =
    regexp_count(lower(c), lit(stopPattern)).cast("long")

  /** Unicode NFC canonical composition via the native codegen'd
    * [[graft.functions.NfcExpression]] (`graft_nfc`). Crawled text mixes
    * precomposed and decomposed forms of the same characters; every
    * byte-level operator downstream (fingerprints, shingles, exact dedup,
    * golden byte-identity) sees them as distinct until this settles the
    * form. Registers the function on the df's session (idempotent).
    * Value-exact vs DuckDB's `nfc_normalize` — driver-gated (`t_nfc`).
    */
  def nfcNative(df: DataFrame)(c: Column): Column = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    call_function(graft.functions.GraftFunctions.NfcName, c)
  }

  /** cp1252-mojibake repair ([[graft.functions.Mojibake.repair]]), native
    * codegen'd — the encoding-fix stage that runs beside NFC in the clean
    * pass. */
  def fixMojibakeNative(df: DataFrame)(c: Column): Column = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    call_function(graft.functions.GraftFunctions.FixMojibakeName, c)
  }

  /** The inverse corruption (fixture synthesis / round-trip gating). */
  def mojibakeNative(df: DataFrame)(c: Column): Column = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    call_function(graft.functions.GraftFunctions.MojibakeName, c)
  }

  /** Canonical form for fingerprinting: lowercase, whitespace collapsed. */
  def normalized(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** NATIVE single-pass per-document stats struct
    * `(chars, words, punct, upper, digits, distinct_tokens, top_bigram)` —
    * the codegen'd [[graft.functions.TextStatsExpression]]
    * (`graft_text_stats`), value-exact with the regex formulations above
    * (NativeSignalsSpec asserts field-by-field parity; the `t_quality` /
    * `t_repetition` oracles gate it end-to-end). One byte scan replaces
    * ~6 regex passes + two array materializations per document. Registers
    * the function on the df's session (idempotent).
    */
  def textStatsNative(df: DataFrame)(c: Column): Column = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    call_function(graft.functions.GraftFunctions.TextStatsName, c)
  }

  /** NATIVE language-signal struct `(m_en, m_es, m_de, m_fr, stop)` —
    * the codegen'd [[graft.functions.LangSignalsExpression]]
    * (`graft_lang_signals`): per-language [[markerMass]] plus
    * [[stopTokenCount]] in two byte scans instead of 17 regex passes.
    * Value-exact with the portable formulations (NativeSignalsSpec;
    * `t_lang_id` / `t_stopword` oracles).
    */
  def langSignalsNative(df: DataFrame)(c: Column): Column = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    call_function(graft.functions.GraftFunctions.LangSignalsName, c)
  }

  /** Language-ID argmax over a precomputed signal struct (native or
    * portable masses) — same precedence/tie rules as [[langId]].
    */
  def langIdFromSignals(ls: Column): Column =
    argmaxLabel(LangMarkers.map { case (l, _) => l -> ls.getField(s"m_$l") }, "und")

  /** Per-PARAGRAPH language ID — the mixed-language-document curation
    * signal: web pages routinely interleave languages (navigation in one,
    * quotes or boilerplate in another), and a document-level lang-ID
    * silently averages them away; training-data pipelines that filter or
    * route by language (CCNet buckets, mC4 splits) segment first. One row
    * per paragraph: (id, pos, n_tokens, para_lang), languages decided by
    * the same marker-mass argmax as [[langId]] via the native signal
    * kernel (one byte scan per paragraph, parity-proven field-by-field in
    * NativeSignalsSpec).
    *
    * Scale shape: map-only — split + posexplode + the native kernel; zero
    * exchanges; paragraph fan-out is bounded by the document's own size.
    */
  def paragraphLangs(d: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ls = langSignalsNative(d)(col("para"))
    d.select(col(idCol), posexplode(split(col(textCol), "\n")).as(Seq("pos", "para")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        tokenCount(col("para")).cast("long").as("n_tokens"),
        langIdFromSignals(ls).as("para_lang"))
  }

  /** Document fingerprint: md5 of the normalized text — the near-trivial
    * but shuffle-cheap dedup key (32 hex chars instead of the document).
    */
  def fingerprint(c: Column): Column = md5(normalized(c))

  /** Exact content hash — P1 semantics (`sha2` hex, lowercase), the
    * relational twin of the kernel's `pdf_hash`
    * (`/root/reference/src/core/extractor.py:297-299`).
    */
  def contentHash(c: Column): Column = sha2(c, 256)

  // ------------------------------------- invisible / bidi sanitization

  /** Zero-width and soft-layout characters: ZWSP, ZWNJ, ZWJ, word joiner,
    * soft hyphen, BOM/ZWNBSP. Invisible in every renderer, yet they break
    * byte-level equality — two visually identical boilerplate passages
    * with interleaved ZWSPs defeat exact AND n-gram dedup (a known
    * SEO/scraper obfuscation), and they inflate tokenizer vocabularies.
    */
  val InvisibleClass = "[\\x{200B}\\x{200C}\\x{200D}\\x{2060}\\x{00AD}\\x{FEFF}]"

  /** Unicode bidirectional control characters (LRE/RLE/PDF/LRO/RLO and
    * the isolate set LRI/RLI/FSI/PDI). Reordering controls make rendered
    * text differ from its logical byte order — the "Trojan Source"
    * vector (CVE-2021-42574); in training data they smuggle content past
    * string-level filters, so curation pipelines strip or flag them.
    */
  val BidiClass = "[\\x{202A}-\\x{202E}\\x{2066}-\\x{2069}]"

  def invisibleChars(c: Column): Column =
    (length(c) - length(regexp_replace(c, InvisibleClass, ""))).cast("long")

  def bidiChars(c: Column): Column =
    (length(c) - length(regexp_replace(c, BidiClass, ""))).cast("long")

  /** Text with both classes removed — the sanitized form dedup
    * fingerprints should be computed over. Map-only, codegen'd.
    */
  def stripInvisible(c: Column): Column =
    regexp_replace(regexp_replace(c, InvisibleClass, ""), BidiClass, "")

  /** Count of literal (non-regex) occurrences of `find`, left-to-right
    * non-overlapping — portable `replace`-and-measure arithmetic.
    * Returned as the number of characters removed; divide by
    * `find.length` for the occurrence count (kept as a product-free int
    * so oracles never do float division).
    */
  def removedChars(c: Column, find: String): Column =
    length(c) - length(regexp_replace(c, Pattern.quote(find), ""))

  /** Characters of punctuation. */
  def punctChars(c: Column): Column =
    length(c) - length(regexp_replace(c, "[.,;:!?]", ""))

  /** Characters of uppercase A-Z. */
  def upperChars(c: Column): Column =
    length(c) - length(regexp_replace(c, "[A-Z]", ""))

  /** Characters of digits. */
  def digitChars(c: Column): Column =
    length(c) - length(regexp_replace(c, "[0-9]", ""))

  /** Marker-mass for one language: total characters matched by the
    * language's function-word markers (each counted padded with single
    * spaces over the space-padded normalized text, so word boundaries are
    * exact). Integer-valued and portable.
    */
  def markerMass(c: Column, markers: Seq[String]): Column = {
    val padded = concat(lit(" "), normalized(c), lit(" "))
    markers.map(m => removedChars(padded, s" $m ")).reduce(_ + _)
  }

  /** Language marker sets for the deterministic lang-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "la", "los", "es"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "les", "des", "et")
  )

  /** Language-ID: argmax of marker mass with fixed precedence order
    * (earlier wins ties); all-zero → "und". Deterministic by construction.
    */
  def langId(c: Column): Column =
    argmaxLabel(LangMarkers.map { case (lang, ms) => lang -> markerMass(c, ms) }, "und")

  /** First label whose (integer) score equals the maximum — fixed
    * precedence order, earlier wins ties; all scores zero → `default`.
    * Shared argmax for [[langId]] and [[dominantNonLatin]].
    */
  private def argmaxLabel(scores: Seq[(String, Column)], default: String): Column = {
    // SINGLE-REFERENCE formulation: each score expression appears exactly
    // once, as the leading field of a struct, and lexicographic array_max
    // picks the winner — the precedence field (descending, so earlier
    // labels beat later ones at equal score) breaks ties, and a
    // (0, n+1, default) sentinel outranks every zero score, which IS the
    // all-zero → default rule. The previous greatest(...) + CASE chain
    // re-inlined every score ~(n+1) times; with scores like markerMass
    // (dozens of regex passes each) that multiplication was the
    // difference between a compiled stage and janino's 64 KB method
    // limit (see [[filterClean]]).
    val n = scores.size
    val entries = scores.zipWithIndex.map { case ((label, s), i) =>
      struct(s.cast("long").as("m"), lit(n - i).as("p"), lit(label).as("l"))
    }
    val sentinel = struct(lit(0L).as("m"), lit(n + 1).as("p"), lit(default).as("l"))
    array_max(array(sentinel +: entries: _*)).getField("l")
  }

  /** Per-document repetition signals (the Gopher repetition-filter family:
    * duplicate-token mass and most-repeated adjacent bigram), computed
    * MAP-ONLY by the native [[graft.functions.TextStatsExpression]]: every
    * signal is document-local, so nothing about it needs a shuffle — the
    * previous formulation exploded slim (id, w1, w2) rows into a corpus
    * exchange plus two aggregations; the native kernel counts bigrams in
    * the same tokenizing pass that counts tokens (per-doc memory
    * ∝ distinct bigrams, bounded by document length). Zero exchanges at
    * any corpus size. [[repetitionStatsRelational]] keeps the portable
    * aggregation formulation as the parity twin (NativeSignalsSpec
    * asserts row-for-row equality; the `t_repetition` DuckDB oracle
    * replays the relational form against the native output).
    *
    * `is_repetitive` gates on integer cross-multiplication only:
    * duplicate tokens > 75% of tokens, or one bigram > 20% of bigrams.
    */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ts = textStatsNative(docs)(col(textCol))
    val nt = col("_ts").getField("words")
    val nd = col("_ts").getField("distinct_tokens")
    val top = col("_ts").getField("top_bigram")
    docs
      .select(col(idCol), ts.as("_ts"))
      .select(col(idCol), nt.as("n_tokens"), nd.as("n_distinct"),
        (nt - nd).as("dup_tokens"), top.as("top_bigram_n"),
        ((nt - nd) * lit(100) > nt * lit(75) ||
          top * lit(100) > greatest(nt - 1, lit(1L)) * lit(20)).as("is_repetitive"))
  }

  /** The relational (explode + aggregate) formulation of
    * [[repetitionStats]] — HOF-free `slice`/`arrays_zip`/`explode`
    * collection expressions with hash aggregations; tokens shuffle once
    * as slim (id, w1, w2) rows. Kept as the engine-portable parity twin
    * the native kernel is spec-checked against (it is also the shape the
    * DuckDB oracle replays).
    */
  def repetitionStatsRelational(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = when(length(trim(col(textCol))) === 0, array().cast("array<string>"))
      .otherwise(split(trim(col(textCol)), "\\s+"))
    val base = docs
      .select(col(idCol), size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"), toks.as("toks"))
    val top = base
      .where(col("n_tokens") >= 2)
      .select(col(idCol), explode(arrays_zip(
        slice(col("toks"), lit(1), size(col("toks")) - 1).as("w1"),
        slice(col("toks"), lit(2), size(col("toks")) - 1).as("w2"))).as("bg"))
      .groupBy(col(idCol), col("bg.w1"), col("bg.w2")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(max(col("c")).as("top_bigram_n"))
    base.drop("toks")
      .join(top, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"), col("n_distinct"),
        (col("n_tokens") - col("n_distinct")).as("dup_tokens"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
        ((col("n_tokens") - col("n_distinct")) * lit(100) > col("n_tokens") * lit(75) ||
          coalesce(col("top_bigram_n"), lit(0L)) * lit(100) >
            greatest(col("n_tokens") - 1, lit(1L)) * lit(20)).as("is_repetitive"))
  }

  /** Unicode-range patterns for script (writing-system) detection. Plain
    * BMP character classes via `\x{...}` escapes — accepted identically by
    * Java regex and RE2 (DuckDB), lookaround-free; each count is one
    * codegen'd replace-and-measure pass, and `length()` counts CODE POINTS
    * in both engines, so the arithmetic is portable.
    */
  val ScriptPatterns: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z]",
    "han" -> "[\\x{4e00}-\\x{9fff}]",
    "cyrillic" -> "[\\x{0400}-\\x{04ff}]",
    "arabic" -> "[\\x{0600}-\\x{06ff}]")

  /** Characters of `script` (a [[ScriptPatterns]] key) in the text. */
  def scriptChars(c: Column, script: String): Column = {
    val p = ScriptPatterns.toMap.apply(script)
    (length(c) - length(regexp_replace(c, p, ""))).cast("long")
  }

  /** Dominant NON-Latin script (argmax with fixed precedence han >
    * cyrillic > arabic; all-zero → "none") — the writing-system signal a
    * multilingual pipeline routes and filters by (Latin is excluded
    * because it dominates any mixed web page's markup-ish residue).
    */
  def dominantNonLatin(c: Column): Column =
    argmaxLabel(
      ScriptPatterns.collect { case (s, _) if s != "latin" => s -> scriptChars(c, s) },
      "none")

  /** The full cleaning gate a training pipeline applies per document, as ONE
    * boolean Column (the same four gates `q_clean_corpus` stages): quality
    * heuristics, resolvable language, the English stopword floor, and the
    * duplicate-token repetition cap.
    *
    * Use [[filterClean]] to APPLY it: FILTER codegen performs no
    * subexpression elimination, so this predicate used directly in a
    * `.filter` re-inlines the normalized-text regexes dozens of times
    * (lang-ID alone references them 16+ ways), the generated method blows
    * janino's 64 KB limit, and Spark silently drops the whole stage to
    * interpreted execution — measured on this exact predicate.
    */
  def isClean(c: Column): Column = {
    val toks = when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))
    val nt = size(toks).cast("long")
    val nd = size(array_distinct(toks)).cast("long")
    val lg = langId(c)
    isQuality(c) &&
      lg =!= "und" &&
      (lg =!= "en" || stopTokenCount(c) >= 2) &&
      !((nt - nd) * lit(100) > nt * lit(75))
  }

  /** Apply [[isClean]] with the plan shape that stays COMPILED and
    * evaluates each signal kernel ONCE per row. The signals come from the
    * two native single-pass expressions ([[textStatsNative]] /
    * [[langSignalsNative]] — the round-4 fix for the measured regex cost:
    * the composed gate previously spent ~20 java.util.regex passes per
    * document and dominated `q_clean_corpus`/`q_training_export`), each
    * projected once as a struct column; the gates then combine cheap
    * field references. Two things keep Catalyst from undoing the staging
    * (filter codegen performs NO subexpression elimination, so a pushed
    * predicate would re-evaluate the kernel once per field reference):
    * (a) each filter carries an always-true `spark_partition_id() >= 0`
    * conjunct — a predicate with a nondeterministic conjunct is never
    * pushed through the projection (a bare barrier COLUMN doesn't work:
    * column pruning deletes the unreferenced alias first, then the push
    * proceeds — measured); and (b) `CollapseProject` refuses to merge
    * multi-referenced non-cheap aliases. CHEAP gates (quality +
    * repetition, one stats scan) run first so failing rows never pay the
    * language-signal scans. Helper columns drop on the way out.
    */
  def filterClean(df: org.apache.spark.sql.DataFrame, textCol: String): org.apache.spark.sql.DataFrame = {
    val c = col(textCol)
    val ts = col("_ts"); val ls = col("_ls")
    val chars = ts.getField("chars"); val words = ts.getField("words")
    val quality = (words >= lit(5)) &&
      (ts.getField("punct") * lit(100) <= chars * lit(20)) &&
      (ts.getField("upper") * lit(100) <= chars * lit(30)) &&
      (chars <= words * lit(20))
    val repetitive =
      (words - ts.getField("distinct_tokens")) * lit(100) > words * lit(75)
    val cheap = df
      .withColumn("_ts", textStatsNative(df)(c))
      .withColumn("_stage_barrier", spark_partition_id())
      .filter(col("_stage_barrier") >= 0 && quality && !repetitive)
    val lg = langIdFromSignals(ls)
    cheap
      .withColumn("_ls", langSignalsNative(df)(c))
      .withColumn("_lg", lg)
      .withColumn("_lang_barrier", spark_partition_id())
      .filter(col("_lang_barrier") >= 0 &&
        col("_lg") =!= "und" &&
        (col("_lg") =!= "en" || ls.getField("stop") >= 2))
      .drop("_ts", "_ls", "_lg", "_stage_barrier", "_lang_barrier")
  }

  /** Quality gate: word-count floor, punctuation ratio cap, uppercase ratio
    * cap, average-word-length cap — all as integer cross-multiplications
    * (never float division) so the predicate is engine-portable and
    * codegen-trivial. Thresholds follow common web-corpus filters
    * (Gopher/C4-style: enough words, not shouting, not punctuation soup).
    */
  // ------------------------------------------------- Gopher quality rules

  /** Non-whitespace characters — the numerator of Gopher's mean-word-
    * length rule, kept as an integer (`mean = token_chars / words` is
    * never materialized; thresholds compare cross-multiplied).
    */
  def tokenChars(c: Column): Column =
    length(regexp_replace(c, "\\s", ""))

  /** Tokens containing at least one ASCII letter. `[^\s]*[A-Za-z][^\s]*`
    * matches once per such token (greedy within the token, cannot cross
    * whitespace, skips letter-free tokens) — lookaround-free, so Java
    * regex and RE2 walk the same matches.
    */
  def alphaWordCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[^\\s]*[A-Za-z][^\\s]*"), lit(0)))

  /** Lines starting with a `- ` or `* ` bullet ((?m) multiline anchor —
    * supported identically by Java regex and RE2).
    */
  def bulletLineCount(c: Column): Column =
    size(regexp_extract_all(c, lit("(?m)^(- |\\* )"), lit(0)))

  /** Lines ending in a literal `...`. */
  def ellipsisLineCount(c: Column): Column =
    size(regexp_extract_all(c, lit("(?m)\\.\\.\\.$"), lit(0)))

  /** Gopher symbol count: `#` characters plus non-overlapping `...`
    * occurrences (literal replace-and-measure — left-to-right
    * non-overlapping on both engines).
    */
  def gopherSymbolCount(c: Column): Column = {
    val hashes = (length(c) - length(regexp_replace(c, "#", ""))).cast("long")
    // removed chars are a multiple of 3 by construction, so the division
    // is exact (the cast floors an already-integral value)
    val dots = ((length(c) - length(replace(c, lit("..."), lit("")))).cast("long") / 3L)
      .cast("long")
    hashes + dots
  }

  /** The Gopher quality-rule gate (Rae et al. 2021, table A1 subset) —
    * every threshold cross-multiplied so the decision is integer-exact
    * and the oracle replays it bit for bit: word count in [minWords,
    * maxWords]; mean word length in [3, 10]; symbol-to-word ratio ≤ 0.1;
    * bullet lines ≤ 90 %; ellipsis lines ≤ 30 %; ≥ 80 % of words contain
    * a letter. (The repetition family is its own operator —
    * [[repetitionStats]].)
    */
  def isGopherQuality(c: Column, minWords: Int = 50, maxWords: Int = 100000): Column = {
    val words = tokenCount(c).cast("long")
    val tch = tokenChars(c).cast("long")
    val lines = size(split(c, "\n")).cast("long")
    (words >= minWords) && (words <= maxWords) &&
      (tch >= words * 3L) && (tch <= words * 10L) &&
      (gopherSymbolCount(c).cast("long") * 10L <= words) &&
      (bulletLineCount(c).cast("long") * 10L <= lines * 9L) &&
      (ellipsisLineCount(c).cast("long") * 10L <= lines * 3L) &&
      (alphaWordCount(c).cast("long") * 10L >= words * 8L)
  }

  def isQuality(c: Column): Column = {
    val chars = length(c)
    val words = tokenCount(c)
    (words >= lit(5)) &&
    (punctChars(c) * lit(100) <= chars * lit(20)) &&
    (upperChars(c) * lit(100) <= chars * lit(30)) &&
    (chars <= words * lit(20)) // mean word length ≤ 19 (+1 for separators)
  }
}
