package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.sample.Importance

/** Model-based quality filtering: a hashed bag-of-features naive-Bayes
  * classifier in the shape CCNet / fastText-era pipelines use to keep
  * "looks like the target distribution" documents (and FineWeb-Edu's
  * classifier-scoring stage generalizes). Features are unigrams PLUS
  * bigrams (fastText's `wordNgrams=2` signature) hashed into B buckets;
  * training is two occurrence counts per bucket (positive-labeled docs vs
  * the rest) and the per-bucket weight is the Laplace-smoothed POSTERIOR
  * of the positive class in fixed-point parts-per-million:
  *
  * {{{
  *   w_ppm = ((cp + 1) * 10^6) DIV (cp + cn + 2)        // P(pos | bucket)
  * }}}
  *
  * A document scores the SUM of its feature buckets' `w_ppm`; the keep
  * decision is "mean posterior at least 1/2" evaluated without division:
  * `2 * score >= 10^6 * n_feats`. Integer-only end to end, so the DuckDB
  * oracle replays it bit for bit (same md5 bucket hash as
  * [[graft.sample.Importance.gramBucket]]).
  *
  * This is deliberately NOT the [[graft.sample.Importance]] operator: DSIR
  * scores `target-likelihood / corpus-likelihood` for importance
  * RESAMPLING toward a distribution; this learns a labeled CLASSIFIER
  * whose posterior gates documents outright. The two share only the
  * hashed-feature plumbing.
  *
  * Overflow headroom: `cp`/`cn` are corpus-occurrence counts — all terms
  * stay below `count * 10^6`, int64-safe past a 100 TB corpus for
  * B >= 4096 (the gated query uses a smaller B only so every bucket is
  * exercised at test scale).
  *
  * Scale shape (10^12 documents):
  *  - the model aggregates to <= B rows via map-side partial counts (only
  *    (bucket, partials) shuffle, never grams or text);
  *  - the weight table BROADCASTS; scoring probes it map-side on the
  *    exploded features;
  *  - the only corpus-sized exchange is the final slim
  *    (id, n_feats, partial-sum) aggregation — documents never move.
  */
object QualityClassifier {

  /** Unigram + bigram feature stream of a text column (one array). */
  def features(c: Column): Column =
    concat(Dedup.shingles(c, 1), Dedup.shingles(c, 2))

  /** <= `buckets`-row weight table (bucket, w_ppm) learned from a labeled
    * corpus; `labelCol` is a boolean column (true = positive class).
    */
  def nbWeights(df: DataFrame, textCol: String, labelCol: String,
                buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    df.select(col(labelCol).as("y"), explode(features(col(textCol))).as("g"))
      .groupBy(Importance.gramBucket(col("g"), buckets).as("bucket"))
      .agg(sum(when(col("y"), 1L).otherwise(0L)).as("cp"),
        sum(when(col("y"), 0L).otherwise(1L)).as("cn"))
      .select(col("bucket"),
        expr("((cp + 1) * 1000000) DIV (cp + cn + 2)").as("w_ppm"))
  }

  /** Score every document against a weight table:
    * (idCol, n_feats, score, post_ppm, keep). Buckets absent from the
    * table (impossible when scoring the training corpus, possible when
    * scoring a NEW crawl against a frozen model) land on the
    * uninformative prior 500000 ppm. Documents with no features keep
    * (vacuous mean posterior), with n_feats = 0.
    */
  def score(corpus: DataFrame, idCol: String, textCol: String,
            weights: DataFrame, buckets: Int): DataFrame = {
    val probed = corpus
      .select(col(idCol).as("id"), explode(features(col(textCol))).as("g"))
      .select(col("id"), Importance.gramBucket(col("g"), buckets).as("bucket"))
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("w_ppm"), lit(500000L))).as("score"))
    corpus.select(col(idCol).as("id"))
      .join(probed, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("score"), lit(0L)).as("score"),
        expr("coalesce(score, CAST(0 AS BIGINT)) DIV greatest(coalesce(n_feats, CAST(0 AS BIGINT)), 1)")
          .as("post_ppm"),
        (coalesce(col("score"), lit(0L)) * lit(2L) >=
          coalesce(col("n_feats"), lit(0L)) * lit(1000000L)).as("keep"))
  }

  /** Train-and-score in one call (the gated-query shape: the corpus is its
    * own training set, labels derived from an existing signal column).
    */
  def trainAndScore(df: DataFrame, idCol: String, textCol: String,
                    labelCol: String, buckets: Int = 4096): DataFrame =
    score(df, idCol, textCol, nbWeights(df, textCol, labelCol, buckets), buckets)
}
