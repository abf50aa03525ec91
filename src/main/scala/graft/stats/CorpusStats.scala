package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped corpus distribution statistics — the per-stratum length/size
  * profile a curation pass reads to set its gates (cf. Gopher/RefinedWeb
  * per-source length distributions).
  *
  * Exact quartiles, not sketches: Spark's `percentile` aggregate buckets
  * by distinct VALUE (an OpenHashMap of value→count per group), so memory
  * is bounded by the number of distinct lengths per stratum — a few
  * hundred thousand at most, independent of row count — which makes the
  * exact form safe at any corpus scale. (For unbounded-cardinality value
  * domains, switch to `percentile_approx`; that variant has no value-exact
  * oracle, so the gated query uses the exact one.)
  *
  * Portability: linear-interpolated quartiles at p∈{25,50,75} over integer
  * values are exact quarter-fractions — `4 × q` is an INTEGER, and every
  * step of its double computation (`lower + (upper−lower)·f`, f a dyadic
  * rational) is exactly representable, so both engines agree bit-for-bit
  * after the ×4 integerization. The gated query ships `q×4` longs.
  */
object CorpusStats {

  /** (group, n_docs, min, p25×4, p50×4, p75×4, max) over an integer value
    * column. One map-side-partial hash aggregate; only (group, value
    * histogram) rows shuffle. */
  def quartilesX4(d: DataFrame, groupCol: String, valueCol: String): DataFrame =
    d.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col(valueCol)).cast("long").as("v_min"),
        (percentile(col(valueCol), lit(0.25)) * 4).cast("long").as("p25_x4"),
        (percentile(col(valueCol), lit(0.5)) * 4).cast("long").as("p50_x4"),
        (percentile(col(valueCol), lit(0.75)) * 4).cast("long").as("p75_x4"),
        max(col(valueCol)).cast("long").as("v_max"))

  /** Adjacent-symbol pair statistics over the pretokenized corpus — the
    * statistic ONE iteration of BPE merge-learning consumes (count every
    * adjacent character pair inside each pretoken, weighted by the
    * pretoken's corpus frequency; the argmax pair becomes the next merge).
    * Emits the deterministic top-K `(pair, n)` rows, ties broken by pair.
    *
    * Scale shape (10^12 documents): the corpus explodes to slim pretoken
    * strings whose ONE exchange is collapsed map-side to the
    * partition-distinct vocabulary (Zipf: ≪ token occurrences); the pair
    * fan-out then runs on the aggregated VOCAB — thousands of rows, not
    * the corpus — and top-K is a `TakeOrderedAndProject` (K rows to the
    * driver, never a global sort). Iterating to learn a full merges table
    * re-segments with the chosen merge applied — a driver loop over this
    * same aggregate; each round's cost is the one vocab exchange.
    */
  def bpePairStats(d: DataFrame, textCol: String, topK: Int = 50): DataFrame = {
    val vocab = d
      .select(explode(regexp_extract_all(col(textCol),
        lit(graft.text.TextAnalytics.BpeTokenPattern), lit(0))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(length(col("token")) >= 2) // single-symbol tokens have no pairs
    vocab
      .select(col("token"), col("cnt"),
        explode(sequence(lit(1), (length(col("token")) - 1).cast("int"))).as("i"))
      .select(expr("substr(token, i, 2)").as("pair"), col("cnt"))
      .groupBy(col("pair")).agg(sum(col("cnt")).cast("long").as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topK)
  }

  /** One-row corpus profile — the "data card" summary published with a
    * training corpus (doc/token totals, language/source cardinality,
    * exact-duplicate rate). All counts are exact integers; the duplicate
    * rate ships as the (n_docs, n_distinct_texts) pair rather than a
    * float so both engines hash-match bit-for-bit.
    *
    * Scale shape: one aggregate with map-side partials; the three
    * count-distincts expand to one expand+two-phase agg over slim keys
    * (lang and source are low-cardinality; the text key is the 16-byte
    * md5 fingerprint, never the text). Nothing else shuffles.
    */
  def corpusCard(d: DataFrame, textCol: String, langCol: String,
                 sourceCol: String): DataFrame =
    d.agg(
      count(lit(1)).as("n_docs"),
      sum(graft.text.TextAnalytics.tokenCount(col(textCol))).cast("long").as("n_tokens"),
      sum(length(col(textCol))).cast("long").as("n_chars"),
      countDistinct(col(langCol)).as("n_langs"),
      countDistinct(col(sourceCol)).as("n_sources"),
      countDistinct(graft.text.TextAnalytics.fingerprint(col(textCol))).as("n_distinct_texts"))

  /** Hash domain of [[hash40]]: 2^40. */
  val Hash40Domain: Long = 1L << 40

  /** Engine-portable 40-bit hash: first 10 hex chars of md5, as a long in
    * `[0, 2^40)` — the same md5-window discipline as
    * [[graft.sample.Sampler.bucket10k]] (DuckDB replays it as
    * `('0x' || substr(md5(x), 1, 10))::BIGINT`). 40 bits keeps the KMV
    * estimator's `(k−1) · 2^40` numerator far inside BIGINT.
    */
  def hash40(c: Column): Column =
    conv(substring(md5(c), 1, 10), 16, 10).cast("long")

  /** Per-stratum distinct cardinality via the [[graft.functions.KmvMinK]]
    * sketch, with the exact count alongside for honesty: one row per
    * group with (n_rows, n_distinct_exact, n_kept, kth_min,
    * est_distinct). Under k distinct values the sketch IS exact
    * (`est = n_kept`); past k the classic estimator
    * `(k−1) · 2^40 DIV kth_min` applies.
    *
    * Scale shape: ONE hash aggregate with a map-side partial whose state
    * is k longs per group — this is the operator to reach for when the
    * exact `countDistinct` (kept here only as the test oracle) becomes
    * the bottleneck: exact distinct plans an Expand + a second shuffle
    * carrying every distinct key; the sketch shuffles k longs per
    * (partition, group) regardless of cardinality.
    */
  def distinctSketch(d: DataFrame, groupCol: String, valueCol: String,
                     k: Int = 16): DataFrame = {
    graft.functions.GraftFunctions.register(d.sparkSession)
    val mink = call_function(graft.functions.GraftFunctions.KmvName,
      hash40(col(valueCol)), lit(k))
    d.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(valueCol)).as("n_distinct_exact"),
        mink.as("mink"))
      .select(col(groupCol), col("n_rows"), col("n_distinct_exact"),
        size(col("mink")).cast("long").as("n_kept"),
        // guard the all-null-values group (empty buffer): element_at(_, 0)
        // throws under ANSI; CaseWhen evaluates branches lazily
        when(size(col("mink")) > 0, element_at(col("mink"), size(col("mink"))))
          .otherwise(lit(0L)).as("kth_min"),
        when(size(col("mink")) < k, size(col("mink")).cast("long"))
          .otherwise(expr(s"(${k - 1}L * ${Hash40Domain}L) DIV greatest(element_at(mink, $k), 1L)"))
          .as("est_distinct"))
  }

  /** Interpolated quartile ×4 over a sorted BIGINT array column `s` —
    * the same quarter-fraction integerization as [[quartilesX4]]
    * (`4 × (lower + (upper − lower) · frac)` with frac ∈ {0, ¼, ½, ¾} is
    * integer-exact), expressed over array indices so it applies to a
    * SAMPLE instead of the full group. `p` counts quarters (1, 2, 3).
    */
  /** Heavy-hitter summary over a key column via the mergeable SpaceSaving
    * aggregate ([[graft.functions.SpaceSavingTopK]]): one row per group
    * with `hh: array<struct<key, count, err>>` sorted by (count desc,
    * key asc) — every key whose total `weight` exceeds group-total/k is
    * guaranteed present, with `count − err ≤ true ≤ count`. `err = 0`
    * for every entry ⟺ the summary ran exactly (k ≥ distinct keys).
    *
    * Scale shape: ObjectHashAggregate with a map-side partial — each
    * input partition reduces to ONE ≤k-entry summary before the shuffle.
    * The exact alternative (groupBy key + TakeOrdered) shuffles one row
    * per DISTINCT key; over urls or n-grams at 10^12 rows that is the
    * key universe, while this carries k entries per partition. Empty
    * `groupCols` = one global summary.
    */
  def heavyHitters(d: DataFrame, groupCols: Seq[String], keyCol: String,
                   weight: Column, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(d.sparkSession)
    val hh = call_function(graft.functions.GraftFunctions.HeavyName,
      col(keyCol), weight.cast("long"), lit(k))
    d.groupBy(groupCols.map(col): _*).agg(hh.as("hh"))
  }

  private def sampleQx4(p: Int): Column = expr(
    s"""CASE WHEN size(s) = 0 THEN CAST(0 AS BIGINT) ELSE
       |  4 * element_at(s, CAST(((size(s) - 1) * $p) DIV 4 + 1 AS INT)) +
       |  (element_at(s, CAST(((size(s) - 1) * $p) DIV 4 +
       |     CASE WHEN ((size(s) - 1) * $p) % 4 > 0 THEN 2 ELSE 1 END AS INT)) -
       |   element_at(s, CAST(((size(s) - 1) * $p) DIV 4 + 1 AS INT))) *
       |  (((size(s) - 1) * $p) % 4)
       |END""".stripMargin.replace('\n', ' '))

  /** Per-stratum quantile sketch via the mergeable bottom-k-by-hash
    * uniform sample ([[graft.functions.BottomKSample]]): one row per
    * group with (n_rows, n_sample, s_min, p25_x4, p50_x4, p75_x4, s_max),
    * the quartiles interpolated over the SAMPLE with the same ×4
    * integerization as [[quartilesX4]]. Under k rows the sample is the
    * group and the quartiles are EXACT — the estimator regime starts
    * past k (spec-gated both ways).
    *
    * Why not GK/KLL: their compaction depends on merge order, so results
    * vary with partitioning; bottom-k membership is order-independent,
    * deterministic at any parallelism, and the DuckDB oracle replays it
    * value-exactly (`row_number() OVER (ORDER BY hash, value) <= k`).
    *
    * Scale shape: ONE hash aggregate with map-side partials carrying k
    * (hash, value) pairs per (partition, group) — the operator to reach
    * for when [[quartilesX4]]'s per-group value histogram (bounded by
    * value cardinality, not row count) outgrows executor memory on an
    * unbounded value domain.
    */
  def quantileSketch(d: DataFrame, groupCol: String, idCol: String,
                     valueCol: String, k: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(d.sparkSession)
    require(k >= 1, s"k must be >= 1, got $k")
    val samp = call_function(graft.functions.GraftFunctions.BottomKName,
      hash40(col(idCol).cast("string")), col(valueCol).cast("long"), lit(k))
    d.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), samp.as("s"))
      .select(col(groupCol), col("n_rows"),
        size(col("s")).cast("long").as("n_sample"),
        when(size(col("s")) > 0, element_at(col("s"), 1))
          .otherwise(lit(0L)).as("s_min"),
        sampleQx4(1).as("p25_x4"),
        sampleQx4(2).as("p50_x4"),
        sampleQx4(3).as("p75_x4"),
        when(size(col("s")) > 0, element_at(col("s"), size(col("s"))))
          .otherwise(lit(0L)).as("s_max"))
  }

  /** Order-invariant corpus digest — the reproducibility manifest row a
    * training run records to PIN its input ("this exact corpus, any
    * partitioning"): `(n_docs, n_distinct_fp, digest40)` where `digest40`
    * is the XOR of a portable 40-bit hash of every `(id, content
    * fingerprint)` pair. XOR is commutative/associative, so the digest is
    * identical under any partitioning, ordering, or cluster size — and
    * any single changed/added/dropped row flips it (40-bit collision odds
    * are the documented trade for engine portability; the (n_docs,
    * n_distinct_fp) pair rides along as the cheap second check).
    * Re-running a pinned experiment starts by re-deriving this row and
    * comparing it to the manifest.
    *
    * Scale shape: one map-side-partial XOR/count aggregate (a single
    * 1-row result); the distinct-fingerprint count shuffles slim 32-hex
    * keys only. Text never moves.
    */
  def corpusDigest(d: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = graft.text.TextAnalytics.fingerprint(col(textCol))
    d.select(col(idCol).cast("string").as("_id"), fp.as("_fp"))
      .select(hash40(concat(col("_id"), lit(":"), col("_fp"))).as("hv"), col("_fp"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("_fp")).as("n_distinct_fp"),
        expr("bit_xor(hv)").as("digest40"))
  }

  /** Concentration of a corpus over a key (domain, source, language):
    * exact Gini coefficient of the per-key document counts plus the top
    * key's share, as one data-card row `(n_keys, n_docs, gini_ppm,
    * top_share_ppm)`. The diversity number a curation pass watches — a
    * corpus where one domain holds half the documents (top_share → 5·10^5,
    * gini → 1) trains very differently from a flat one (gini → 0); cf.
    * the per-source mixture tables in Gopher/Pile data cards.
    *
    * Exact at any scale WITHOUT a global rank: Gini over sorted counts
    * `c_1 ≤ … ≤ c_n` needs `Σ i·c_i`, and ranks within a tie group are
    * interchangeable (equal c), so grouping by COUNT VALUE gives the
    * closed form `Σ_groups c·(m·a + m(m+1)/2)` where `m` is the group
    * size and `a` the number of keys in smaller groups. The relation
    * that needs ordering is counts-of-COUNTS — bounded by the number of
    * distinct count values, O(√Σc) under any distribution (a few
    * thousand at 10^12 docs) — so the one window here runs over a
    * metadata-sized relation, never over keys or documents.
    *
    * `gini_ppm := ((2·Σi·c_i − (n+1)·S) · 10^6) DIV (n·S)` computed in
    * DECIMAL(38,0): the numerator reaches ~10^26 at the design point
    * (n ~ 10^8 keys, S ~ 10^12 docs), past BIGINT but comfortably inside
    * 38 digits; DuckDB replays it in HUGEINT. Chebyshev's sum inequality
    * makes the numerator non-negative, so floor-vs-truncate division
    * never diverges between the engines.
    */
  def concentration(d: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = d.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val cc = counts.groupBy(col("cnt")).agg(count(lit(1)).as("m"))
    val wExcl = Window.orderBy(col("cnt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val dec: Column => Column = _.cast("decimal(38,0)")
    cc.withColumn("a", coalesce(sum(col("m")).over(wExcl), lit(0L)))
      .select(
        (dec(col("cnt")) *
          (dec(col("m")) * dec(col("a")) +
            // tie term m·(m+1)/2 via the even-half split so EVERY factor
            // stays in BIGINT range before the DECIMAL(38,0) product:
            // m*(m+1) computed in BIGINT wraps silently past m ≈ 3·10^9 —
            // a plausible count=1 tie group at a 10^10-key corpus
            dec(expr("CASE WHEN m % 2 = 0 THEN m DIV 2 ELSE m END")) *
            dec(expr("CASE WHEN m % 2 = 0 THEN m + 1 ELSE (m + 1) DIV 2 END"))))
          .as("contrib"),
        col("m"), (dec(col("cnt")) * dec(col("m"))).as("docs"), col("cnt"))
      .agg(sum(col("contrib")).as("sumic"), sum(col("m")).as("n"),
        sum(col("docs")).as("s"), max(col("cnt")).as("mx"))
      .select(
        col("n").cast("long").as("n_keys"),
        col("s").cast("long").as("n_docs"),
        expr("CAST(((2 * sumic - (n + 1) * s) * 1000000) DIV (n * s) AS BIGINT)")
          .as("gini_ppm"),
        expr("CAST((CAST(mx AS DECIMAL(38,0)) * 1000000) DIV s AS BIGINT)")
          .as("top_share_ppm"))
  }
}
