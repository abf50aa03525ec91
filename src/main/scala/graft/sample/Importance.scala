package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every corpus document
  * by how much its hashed-n-gram distribution looks like a small TARGET set
  * (the domain you want more of) relative to the raw corpus, so a later
  * sampling pass can resample toward the target mixture.
  *
  * Both distributions are bag-of-hashed-n-grams unigram models over B
  * buckets. The per-bucket weight is a Laplace-smoothed likelihood ratio in
  * fixed point rather than DSIR's log-ratio:
  *
  * {{{
  *   pt_ppm = ((ct + 1) * 10^6) DIV (St + B)       // target bucket ppm
  *   pr_ppm = ((cr + 1) * 10^6) DIV (Sr + B)       // raw bucket ppm
  *   w_ppm  = (pt_ppm * 10^6) DIV max(pr_ppm, 1)   // ratio, ppm precision
  * }}}
  *
  * and a document's score is the sum (and integer mean) of its grams'
  * `w_ppm`. The ratio keeps the per-bucket ORDERING of the log-ratio
  * (x ↦ ln x is monotone) and stays integer-only end to end, so the score
  * is hash-exact across engines — the DuckDB oracle replays it bit for bit.
  * Consumers rank or threshold on `avg_w` (sum-of-ratios is not
  * sum-of-logs; it up-weights strong single-bucket hits slightly more,
  * which is the desired behavior for a selection score).
  *
  * Overflow headroom: every intermediate is bounded by `max(count) × 10^6`
  * — safe in int64 up to ~9 × 10^12 occurrences of one bucket, i.e. far
  * past a 100 TB corpus at B ≥ 4096. The two-stage ppm staging exists
  * exactly so no term ever multiplies two corpus-sized counts together.
  *
  * Scale shape (the part that matters at 10^12 documents):
  *  - both bucket models aggregate to ≤ B rows via map-side partial
  *    counts — only (bucket, partial) rows shuffle, never grams;
  *  - the weight table is ≤ B rows and is BROADCAST; scoring is a map-side
  *    hash probe on the exploded corpus grams;
  *  - the only corpus-sized exchange is the final slim (id, partial sum)
  *    aggregation — documents themselves never move.
  */
object Importance {

  /** Uniform gram bucket in [0, buckets): first 8 hex chars of md5 read as
    * an integer, mod buckets — engine-portable
    * (`('0x' || substr(md5(g), 1, 8))::BIGINT % buckets`).
    */
  def gramBucket(g: Column, buckets: Int): Column =
    pmod(conv(substring(md5(g), 1, 8), 16, 10).cast("long"), lit(buckets.toLong))

  /** (bucket, cnt) hashed-n-gram OCCURRENCE counts (a bag, not a set —
    * DSIR's feature is the n-gram count vector). ≤ `buckets` rows out.
    */
  def bucketCounts(df: DataFrame, textCol: String, buckets: Int, n: Int): DataFrame =
    df.select(explode(Dedup.shingles(col(textCol), n)).as("g"))
      .groupBy(gramBucket(col("g"), buckets).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Per-document importance scores against a target set:
    * (id, n_grams, sum_w, avg_w). Documents with no grams (< n tokens)
    * score 0 with n_grams = 0. `target` is any DataFrame with a text
    * column — typically a high-quality slice of the corpus itself or a
    * small external exemplar set; its model is built the same way and the
    * smoothing (+1 per bucket) keeps weights finite when it is tiny.
    */
  def importanceWeights(corpus: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String,
      buckets: Int = 4096, n: Int = 2): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(n >= 1, s"n must be >= 1, got $n")
    val raw = bucketCounts(corpus, textCol, buckets, n).withColumnRenamed("cnt", "cr")
    val tgt = bucketCounts(target, targetTextCol, buckets, n).withColumnRenamed("cnt", "ct")
    // one-row totals, cross-joined onto the <= B-row weight table (the
    // raw model covers every bucket the corpus can probe, so the probe
    // join below is inner and total)
    val rawTot = raw.agg(sum(col("cr")).as("sr"))
    val tgtTot = tgt.agg(coalesce(sum(col("ct")), lit(0L)).as("st"))
    val weights = raw
      .join(tgt, Seq("bucket"), "left")
      .crossJoin(rawTot).crossJoin(tgtTot)
      .select(col("bucket"), expr(
        s"((((coalesce(ct, CAST(0 AS BIGINT)) + 1) * 1000000) DIV (st + $buckets)) * 1000000)" +
          s" DIV greatest(((cr + 1) * 1000000) DIV (sr + $buckets), CAST(1 AS BIGINT))")
        .as("w_ppm"))
    val scored = corpus
      .select(col(idCol).as("id"), explode(Dedup.shingles(col(textCol), n)).as("g"))
      .select(col("id"), gramBucket(col("g"), buckets).as("bucket"))
      .join(broadcast(weights), Seq("bucket"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("w_ppm")).as("sum_w"))
    corpus.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("sum_w"), lit(0L)).as("sum_w"),
        expr("coalesce(sum_w, CAST(0 AS BIGINT)) DIV greatest(coalesce(n_grams, CAST(0 AS BIGINT)), 1)")
          .as("avg_w"))
  }
}
