package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the downsampling step of a
  * training-data pipeline (per-source/per-language mixture control).
  *
  * The keep/drop decision is a pure function of the document id: the
  * first 8 hex chars of `md5(id)` read as an integer modulo 10 000 give
  * a uniform bucket in [0, 10000), and a document survives iff its
  * bucket is below the stratum's rate in basis points. md5 (not
  * xxhash64) so the decision is reproducible in any engine — the DuckDB
  * oracle replays it exactly — and stable across Spark versions.
  *
  * Scale shape: the rates table is tiny (one row per stratum) and
  * broadcast, so sampling is a map-only filter over the corpus — zero
  * shuffle of document rows, filter and pruning push to the scan, and
  * the output keeps the input's partitioning. Changing the mixture
  * re-reads nothing but the rates.
  */
object Sampler {

  /** Uniform bucket in [0, 10000) derived from the id via md5 — engine
    * portable (`conv(substr(md5, 1, 8), 16, 10) % 10000`).
    */
  def bucket10k(id: Column): Column =
    (conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % 10000).cast("int")

  /** Deterministic sub-stream in [0, n) from md5 hex chars 9–16 — a hash
    * window, NOT `id % n`: ids are routinely assigned round-robin by
    * source, so `id % n` can correlate with a stratum and starve
    * sub-streams. Chars 9–16 keep it independent of [[bucket10k]]
    * (chars 1–8), so budget sampling composes with rate sampling.
    * Portable: `('0x' || substr(md5(id::varchar), 9, 8))::BIGINT % n`.
    */
  def subStream(id: Column, n: Int): Column =
    pmod(conv(substring(md5(id.cast("string")), 9, 8), 16, 10).cast("long"), lit(n.toLong))

  /** The fractional-copy decision bucket for [[upsampleByEpochs]]: md5 hex
    * chars 17–24 — a window DISJOINT from [[bucket10k]] (1–8) and
    * [[subStream]] (9–16), so down-sampling then fractional up-sampling
    * compose independently. Sharing the rate-sampling window would make
    * every rate-sampling survivor (bucket < rate_bp by construction) also
    * win the extra copy whenever `frac_bp <= rate_bp` — 2.5 epochs over a
    * 0.5-rate stratum would silently become 3.0.
    */
  def upsampleBucket10k(id: Column): Column =
    (conv(substring(md5(id.cast("string")), 17, 8), 16, 10).cast("long") % 10000).cast("int")

  /** Keep rows whose md5 bucket falls under their stratum's rate.
    *
    * @param rates one row per stratum: the join keys in `strataCols`
    *              plus `rate_bp` (basis points in [0, 10000]); must be
    *              small — it is broadcast.
    */
  def sampleStratified(docs: DataFrame, rates: DataFrame, idCol: String,
      strataCols: Seq[String]): DataFrame =
    docs.join(broadcast(rates), strataCols)
      .where(bucket10k(col(idCol)) < col("rate_bp"))

  /** Sample each stratum down to a TOKEN budget — the mixture-construction
    * step of a training run ("x billion tokens of web, y of code"), where
    * the unit that matters is tokens, not documents, so a per-document
    * rate cannot express it.
    *
    * Semantics: within each (stratum, [[subStream]]) sub-stream — the
    * sub-stream is a HASH of the id, not `id % n`, so id-assignment
    * schemes that correlate with strata cannot starve a sub-stream —
    * documents are taken in `md5(id)` order (hash order — unbiased
    * w.r.t. crawl position or anything correlated with id) until the
    * sub-stream's share of the budget is spent; the document straddling
    * the boundary is KEPT, so each sub-stream overshoots its share by
    * less than one document. Shares are `budget DIV subStreams`, with the
    * remainder dealt one token each to the lowest sub-streams, so shares
    * sum exactly to `budget`. Bound, stated plainly: if every sub-stream
    * holds at least its share of tokens, total kept weight is in
    * `[budget, budget + subStreams × maxDocWeight)`; a starved sub-stream
    * keeps everything it has (it cannot borrow another stream's budget —
    * the price of never funneling a stratum through one sort).
    *
    * Scale shape: `budgets` is one row per stratum and broadcast; the
    * corpus takes ONE Exchange on (stratum, sub-stream) — key space =
    * strata × subStreams, tuned to the cluster, so a mega-stratum never
    * becomes a single-partition sort — then an in-partition prefix-sum
    * window and a codegen'd filter. All arithmetic is BIGINT DIV/mod,
    * replayed bit-for-bit by the DuckDB oracle.
    *
    * @param budgets one row per stratum: `stratumCol` plus `budget`
    *                (tokens, BIGINT ≥ 0); must be small — it is broadcast.
    * @param weightCol per-document token count (BIGINT ≥ 0).
    */
  def sampleToTokenBudget(docs: DataFrame, budgets: DataFrame, idCol: String,
      stratumCol: String, weightCol: String, subStreams: Int = 16): DataFrame = {
    require(subStreams > 0, s"subStreams must be positive, got $subStreams")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol), col("graft_sub"))
      .orderBy(md5(col(idCol).cast("string")))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.join(broadcast(budgets), Seq(stratumCol))
      .withColumn("graft_sub", subStream(col(idCol), subStreams))
      .withColumn("graft_cum", coalesce(sum(col(weightCol)).over(w), lit(0L)))
      .withColumn("graft_share",
        expr(s"budget DIV ${subStreams}L") +
          when(col("graft_sub") < expr(s"budget % ${subStreams}L"), lit(1L))
            .otherwise(lit(0L)))
      .where(col("graft_cum") < col("graft_share"))
      .drop("graft_sub", "graft_cum", "graft_share", "budget")
  }

  /** Leakage-safe holdout split: adds `splitCol` = "val" iff the KEY's
    * md5 bucket falls under `valBp` basis points, else "train". Splitting
    * by a GROUPING key (registered domain, canonical url, cluster id)
    * rather than the document id is the point: near-duplicates and
    * templated pages concentrate within a domain, so an id-hash split
    * leaks train content into validation through its near-copies — a
    * domain-keyed split puts every page of a domain on the same side.
    * The decision reuses [[bucket10k]] (md5 chars 1–8), so it is
    * engine-portable and reproducible run-over-run; re-crawling a domain
    * never migrates it across the split.
    *
    * Scale shape: map-only — a hash of a column already on the row; zero
    * shuffle, zero state, composes with every downstream filter.
    */
  def holdoutSplit(docs: DataFrame, keyCol: String, valBp: Int,
      splitCol: String = "split"): DataFrame = {
    require(valBp >= 0 && valBp <= 10000, s"valBp must be in [0, 10000], got $valBp")
    docs.withColumn(splitCol,
      when(bucket10k(col(keyCol)) < valBp, lit("val")).otherwise(lit("train")))
  }

  /** Exact integer square root: `floor(sqrt(n))` for `n ≥ 0`. Float sqrt
    * plus a ±1 Newton correction, so the result is exact even where the
    * IEEE rounding of `sqrt(double)` lands on the wrong side of an
    * integer — which is what makes it engine-portable (the DuckDB oracle
    * applies the same correction) and bit-stable across JVMs/libm builds.
    */
  def isqrt(n: Column): Column = {
    // isqrt(Long.MaxValue) — candidates are clamped here so the squaring
    // in the correction can never overflow (beyond the clamp, s² wraps
    // negative and the comparison silently inverts)
    val cap = 3037000499L
    val s0 = least(floor(sqrt(n.cast("double"))).cast("long"), lit(cap))
    val s1 = when(s0 < cap && (s0 + 1) * (s0 + 1) <= n, s0 + 1).otherwise(s0)
    when(s1 * s1 > n, s1 - 1).otherwise(s1)
  }

  /** Temperature-balanced mixture sampling (the XLM-R / mC4 recipe at
    * τ = 2, i.e. exponent α = 1/2): keep probability per stratum is
    * chosen so the EXPECTED kept count is proportional to `√n_stratum`,
    * flattening a head-heavy language/source distribution without the
    * float `pow` that would break engine-portable replay — `√n` is the
    * one temperature exponent with an exact integer form ([[isqrt]]).
    *
    * Semantics, all BIGINT (mirrored by the oracle): with
    * `T = (Σn · targetBp) DIV 10000` (the overall keep target as a
    * corpus fraction) and `S = Σ isqrt(n_l)`, each stratum's expected
    * keep is `k_l = (T · isqrt(n_l)) DIV S` and its per-document rate is
    * `min(10000, (k_l · 10000) DIV n_l)` basis points — a tail stratum
    * whose fair share exceeds its size CAPS at keep-everything (rate
    * 10000), the standard temperature-sampling behavior (up-sampling
    * beyond 1 epoch is [[upsampleByEpochs]]'s job, deliberately separate).
    * The keep decision reuses [[bucket10k]].
    *
    * Scale shape: two passes, both cheap — a slim map-side-partial count
    * of ONLY the stratum column (at 100 TB these counts usually already
    * exist as corpus-card stats), then the rates table (one row per
    * stratum) broadcasts and the keep is a map-only filter; document
    * rows never shuffle. Overflow bound: `T · isqrt(max n)` stays under
    * 2^63 for corpora to ~4×10^12 docs — guarded, not assumed.
    */
  def sampleTemperature(docs: DataFrame, idCol: String, stratumCol: String,
      targetBp: Int): DataFrame = {
    require(targetBp >= 0 && targetBp <= 10000,
      s"targetBp must be in [0, 10000], got $targetBp")
    val counts = docs.groupBy(col(stratumCol)).agg(count(lit(1)).as("graft_n"))
    val sq = counts.withColumn("graft_s", isqrt(col("graft_n")))
    val tot = sq.agg(sum(col("graft_s")).as("graft_tot"),
      sum(col("graft_n")).as("graft_total"))
    val rates = sq.crossJoin(broadcast(tot))
      .withColumn("graft_t", expr(s"(graft_total * ${targetBp}L) DIV 10000L"))
      // runtime overflow guard on the tiny rates table: long wrap-around
      // here would silently mis-rate a stratum at extreme corpus sizes
      .withColumn("graft_guard", assert_true(
        col("graft_t") <= lit(Long.MaxValue) / greatest(col("graft_s"), lit(1L)),
        lit("sampleTemperature: T * isqrt(n) overflows long — corpus too large for bp math")))
      .withColumn("rate_bp", least(lit(10000L),
        expr("(((graft_t * graft_s) DIV graft_tot) * 10000L) DIV graft_n")))
      .where(col("graft_guard").isNull)
      .select(col(stratumCol), col("rate_bp"))
    docs.join(broadcast(rates), Seq(stratumCol))
      .where(bucket10k(col(idCol)) < col("rate_bp"))
  }

  /** Up-sample strata by FRACTIONAL epoch counts — the other half of
    * mixture construction (training recipes repeat high-quality sources:
    * "2.5 epochs of wiki, 0.5 of crawl"). Each document appears
    * `floor(epochs)` times, plus one more copy iff its [[upsampleBucket10k]]
    * bucket falls under the fractional part — so a stratum at 2.5 epochs
    * emits every document twice and a uniform, deterministic half of them
    * a third time. Epochs are in basis points (25000 = 2.5) to keep the
    * arithmetic integer and engine-portable; 0 bp drops the stratum.
    *
    * Output adds a `copy` column (0-based repeat index) so downstream
    * feed stages (shard packing, sequence packing) can keep copies apart.
    *
    * Scale shape: `epochs` is one row per stratum and broadcast; the
    * repeat is a map-only `explode(sequence(...))` — ZERO shuffle, no
    * skew (each row fans out by its own small factor), and the output
    * keeps the input's partitioning. The `sequence` bounds are guarded so
    * a 0-copy row yields an empty array, never a descending sequence.
    *
    * @param epochs one row per stratum: `stratumCol` plus `epochs_bp`
    *               (basis points ≥ 0); must be small — it is broadcast.
    */
  def upsampleByEpochs(docs: DataFrame, epochs: DataFrame, idCol: String,
      stratumCol: String): DataFrame = {
    val base = expr("epochs_bp DIV 10000L")
    val extra = when(upsampleBucket10k(col(idCol)) < expr("epochs_bp % 10000L"), lit(1L))
      .otherwise(lit(0L))
    docs.join(broadcast(epochs), Seq(stratumCol))
      .withColumn("graft_copies", base + extra)
      .where(col("graft_copies") > 0)
      .withColumn("copy",
        explode(sequence(lit(0L), col("graft_copies") - 1)))
      .drop("graft_copies", "epochs_bp")
  }
}
