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

  /** One row per adjacent-trigram position: (id, w1, w2, w3). Same
    * codegen'd slice/zip/explode shape as [[bigramPositions]].
    */
  def trigramPositions(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(textCol)
    docs
      .select(col(idCol).as("id"), t.as("l"))
      .where(size(col("l")) >= 3)
      .select(col("id"), explode(arrays_zip(
        slice(col("l"), lit(1), size(col("l")) - 2).as("w1"),
        slice(col("l"), lit(2), size(col("l")) - 2).as("w2"),
        slice(col("l"), lit(3), size(col("l")) - 2).as("w3"))).as("tg"))
      .select(col("id"), col("tg.w1").as("w1"), col("tg.w2").as("w2"), col("tg.w3").as("w3"))
  }

  /** The three pruned model tables of a stupid-backoff trigram LM
    * (Brants et al. 2007 — the LM design built FOR web-scale corpora:
    * no discounting statistics to fit, every level a plain count ratio,
    * so training is three count aggregations and scoring never needs
    * normalization): `tri (w1,w2,w3,p3_ppm)`, `bi (w2,w3,p2_ppm)`,
    * `uni (w3,p1_ppm)`. Context totals are computed BEFORE pruning at
    * every level (probabilities stay proper); each level prunes to
    * count ≥ minCount, so all three tables are vocabulary-bounded under
    * Zipf — broadcastable regardless of corpus row count.
    */
  final case class BackoffModel(tri: DataFrame, bi: DataFrame, uni: DataFrame)

  def stupidBackoffModel(train: DataFrame, idCol: String, textCol: String,
                         minCount: Int = 2): BackoffModel = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val c123 = trigramPositions(train, idCol, textCol)
      .groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("c"))
    val c12 = c123.groupBy(col("w1"), col("w2")).agg(sum(col("c")).as("cc"))
    val tri = c123.where(col("c") >= minCount).join(c12, Seq("w1", "w2"))
      .select(col("w1"), col("w2"), col("w3"), expr("(c * 1000000) DIV cc").as("p3_ppm"))
    val c23 = bigramPositions(train, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    val c2 = c23.groupBy(col("w1")).agg(sum(col("c")).as("cc"))
    val bi = c23.where(col("c") >= minCount).join(c2, Seq("w1"))
      .select(col("w1").as("w2"), col("w2").as("w3"), expr("(c * 1000000) DIV cc").as("p2_ppm"))
    val toksOnly = train.select(explode(toks(textCol)).as("w3"))
    val cu = toksOnly.groupBy(col("w3")).agg(count(lit(1)).as("c"))
    val uni = cu.where(col("c") >= minCount)
      .crossJoin(broadcast(cu.agg(sum(col("c")).as("n"))))
      .select(col("w3"), expr("(c * 1000000) DIV n").as("p1_ppm"))
    BackoffModel(tri, bi, uni)
  }

  /** Per-document stupid-backoff score: each trigram position contributes
    * its trigram probability when the pruned trigram model knows it, else
    * α = 0.4 times the bigram probability, else α² = 0.16 times the
    * unigram probability, else 0 — all fixed-point ppm (`×4 DIV 10`,
    * `×16 DIV 100`), so Spark and the oracle agree bit-for-bit. Output:
    * (id, n_trigrams, tri_hits, bi_hits, uni_hits, sum_ppm, avg_ppm);
    * docs under 3 tokens score 0 with n_trigrams = 0.
    *
    * Scale shape: identical to [[lmScore]] — all three model tables
    * broadcast (vocabulary-bounded), positions probe them map-side, the
    * only exchange is the slim per-document aggregate with map-side
    * partials. Documents never shuffle.
    */
  def stupidBackoffScore(docs: DataFrame, model: BackoffModel,
                         idCol: String, textCol: String): DataFrame = {
    val scored = trigramPositions(docs, idCol, textCol)
      .join(broadcast(model.tri), Seq("w1", "w2", "w3"), "left")
      .join(broadcast(model.bi), Seq("w2", "w3"), "left")
      .join(broadcast(model.uni), Seq("w3"), "left")
      .withColumn("s_ppm", coalesce(
        col("p3_ppm"),
        expr("(4 * p2_ppm) DIV 10"),
        expr("(16 * p1_ppm) DIV 100"),
        lit(0L)))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_trigrams"),
        count(col("p3_ppm")).as("tri_hits"),
        sum(when(col("p3_ppm").isNull && col("p2_ppm").isNotNull, 1L)
          .otherwise(0L)).as("bi_hits"),
        sum(when(col("p3_ppm").isNull && col("p2_ppm").isNull && col("p1_ppm").isNotNull, 1L)
          .otherwise(0L)).as("uni_hits"),
        sum(col("s_ppm")).as("sum_ppm"))
    docs.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("tri_hits"), lit(0L)).as("tri_hits"),
        coalesce(col("bi_hits"), lit(0L)).as("bi_hits"),
        coalesce(col("uni_hits"), lit(0L)).as("uni_hits"),
        coalesce(col("sum_ppm"), lit(0L)).as("sum_ppm"),
        expr("coalesce(sum_ppm, CAST(0 AS BIGINT)) DIV greatest(coalesce(n_trigrams, CAST(0 AS BIGINT)), 1)")
          .as("avg_ppm"))
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
