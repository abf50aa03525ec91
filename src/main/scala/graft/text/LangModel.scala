package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model fluency score — the CCNet/Gopher
  * "perplexity filter" reshaped for engine portability: documents whose
  * adjacent-word transitions are improbable under a model trained on a
  * trusted reference slice are flagged for removal. This is the standard
  * web-corpus quality gate the per-document heuristics
  * ([[TextAnalytics.isQuality]], stopword/repetition gates) cannot
  * replace: those see one document at a time, while the LM scores each
  * document against corpus-level transition statistics.
  *
  * Portability (the reason this is NOT literal KenLM): log-probabilities
  * sum doubles in engine-dependent order, so a log-space score can never
  * hash-match an oracle. The score here is fixed-point arithmetic-mean
  * conditional probability: each bigram (w1, w2) contributes
  * `p_ppm = (c12 × 10^6) DIV c1` parts-per-million, where `c12` is the
  * training count of the bigram and `c1 = Σ_w2 c12(w1, ·)` the training
  * count of its context, and a document's score is `sum_ppm DIV
  * n_bigrams`. Integer-only end to end — Spark and DuckDB agree
  * bit-for-bit — and monotone in the same direction as (negated)
  * perplexity for the gating decision: fluent text has frequent
  * transitions, gibberish has unseen ones (p = 0, the floor a backoff
  * model would soften). A production deployment that needs true
  * perplexity swaps the per-bigram column for `ln(p)` and accepts
  * float tolerance in its checks; the plan shape is identical.
  *
  * Scale shape (10^12 documents):
  *  - TRAINING runs over a reference slice (CCNet trains on Wikipedia;
  *    the gated query trains on the `lang = 'en'` slice), and the model
  *    is PRUNED to bigrams with count ≥ minCount — Zipf makes the
  *    surviving table vocabulary-bounded (millions of rows, ~tens of MB),
  *    independent of corpus row count;
  *  - SCORING is map-only: the pruned model broadcasts (explicit
  *    `broadcast()` hint), each document's bigrams probe the hash
  *    relation in place, and the only exchange is the slim
  *    (id, count, sum) per-document aggregate with map-side partials.
  *    Documents never shuffle;
  *  - context counts `c1` are aggregated from `c12` (bigram-distinct
  *    rows), not from raw token positions — two small aggregations over
  *    the already-collapsed bigram table instead of a second corpus pass.
  */
object LangModel {

  /** Lowercased whitespace tokens; `[]` for blank text (split("") would
    * yield [""]). Lowercasing folds "The"/"the" into one context — the
    * usual LM normalization, and it matches `t_vocab_topk`'s convention.
    */
  private def toks(textCol: String) =
    when(length(trim(col(textCol))) === 0, array().cast("array<string>"))
      .otherwise(split(trim(lower(col(textCol))), "\\s+"))

  /** One row per adjacent-bigram position: (id, w1, w2). Codegen'd
    * collection expressions only (`slice` + `arrays_zip` + `explode`,
    * the [[TextAnalytics.repetitionStats]] pattern — higher-order
    * functions run interpreted).
    */
  def bigramPositions(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(textCol)
    docs
      .select(col(idCol).as("id"), t.as("l"))
      .where(size(col("l")) >= 2)
      .select(col("id"), explode(arrays_zip(
        slice(col("l"), lit(1), size(col("l")) - 1).as("w1"),
        slice(col("l"), lit(2), size(col("l")) - 1).as("w2"))).as("bg"))
      .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
  }

  /** Pruned conditional-probability model (w1, w2, p_ppm) from a training
    * slice. Context totals are computed BEFORE pruning, so the retained
    * probabilities stay proper (Σ_w2 p ≤ 10^6 per context with equality
    * when nothing was pruned).
    */
  def bigramModel(train: DataFrame, idCol: String, textCol: String,
                  minCount: Int = 2): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val c12 = bigramPositions(train, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    c12.where(col("c12") >= minCount)
      .join(c1, "w1")
      .select(col("w1"), col("w2"), expr("(c12 * 1000000) DIV c1").as("p_ppm"))
  }

  /** Per-document fluency score against a trained model: (id, n_bigrams,
    * seen_bigrams, sum_ppm, avg_ppm). Documents with < 2 tokens score 0
    * with n_bigrams = 0 (nothing to judge — callers gate on n_bigrams).
    * Unseen bigrams contribute 0 (the hard-backoff floor). The model side
    * is broadcast: scoring is a map-side hash probe however large the
    * corpus is.
    */
  def lmScore(docs: DataFrame, model: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scored = bigramPositions(docs, idCol, textCol)
      .join(broadcast(model), Seq("w1", "w2"), "left")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        count(col("p_ppm")).as("seen_bigrams"),
        coalesce(sum(col("p_ppm")), lit(0L)).as("sum_ppm"))
    docs.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("seen_bigrams"), lit(0L)).as("seen_bigrams"),
        coalesce(col("sum_ppm"), lit(0L)).as("sum_ppm"),
        expr("coalesce(sum_ppm, CAST(0 AS BIGINT)) DIV greatest(coalesce(n_bigrams, CAST(0 AS BIGINT)), 1)")
          .as("avg_ppm"))
  }
}
