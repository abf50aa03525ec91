package graft.stats

import org.apache.spark.sql.DataFrame
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
}
