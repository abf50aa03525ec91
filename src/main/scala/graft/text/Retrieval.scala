package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ranked keyword retrieval over the corpus: BM25-family scoring with
  * k1 = 1.2, b = 0.75 in FIXED-POINT INTEGER arithmetic, so the score is
  * bit-portable across engines (the DuckDB oracle replays it exactly —
  * same discipline as [[graft.web.LinkGraph]]'s integerized PageRank).
  * This is the curation-side search a training-data pipeline runs
  * constantly: "rank documents for these probe terms" (contamination
  * spot-checks, topic audits, eval-leak triage).
  *
  * Two deliberate, documented deviations from textbook BM25, both forced
  * by engine portability:
  *   - the idf term is the RATIONAL rarity weight
  *     `idf_x1m = ((N − df) · 10^6) DIV df` instead of
  *     `ln((N − df + 0.5)/(df + 0.5))`: `ln` is not bit-identical across
  *     engines, while the rational weight is pure BIGINT division, shares
  *     the log-idf's strict monotone decrease in df (so per-term document
  *     ranking is unchanged), and stays ≥ 0 (log-idf goes negative past
  *     df > N/2, a known BM25 wart).
  *   - all ×10^6 fixed-point divisions truncate (`DIV`), so scores are
  *     exact integers; ranking ties break by ascending id.
  *
  * Scale shape: the corpus explodes to tokens MAP-SIDE and the `isin`
  * prune to the probe terms happens before any exchange — at 10^12 docs
  * only matched (id, term) postings shuffle, the inverted-index shape.
  * Corpus stats (N, avgdl) are a one-row aggregate broadcast back; term
  * document frequencies are ≤ |terms| rows, broadcast-joined. The final
  * top-k is `TakeOrderedAndProject` (k rows to the driver), never a
  * global sort.
  *
  * Overflow bounds (BIGINT): the score product is quotient/remainder-
  * decomposed — `(a·b) DIV m = (a DIV m)·b + ((a mod m)·b) DIV m`, exact
  * for non-negatives — so `idf_x1m` (≤ N·10^6, i.e. up to 10^15 at
  * N = 10^9) never multiplies `ratio_x1m` (≤ 2.2·10^6) directly; the
  * decomposed terms stay ≤ 2.2·10^15. The ratio numerator `tf·2.2·10^12`
  * requires tf < 4·10^6 — generous for any real document.
  */
object Retrieval {

  /** Top-k documents by summed per-term BM25 score over `terms`.
    * Output: (id, n_terms_matched, score_x1m), score descending, id
    * ascending — deterministic under ties.
    */
  def bm25TopK(d: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(k > 0, s"k must be positive, got $k")
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val base = d.select(col(idCol),
      when(length(trim(col(textCol))) === 0, array().cast("array<string>"))
        .otherwise(toks).as("toks"))
      .select(col(idCol), col("toks"), size(col("toks")).cast("long").as("dl"))
    // one-row corpus stats (N, integer avgdl), broadcast back to the postings
    val stats = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
      .select(col("n_docs"), expr("tot DIV n_docs").as("avgdl"))
    // inverted postings: the term prune runs in the SAME map task as the
    // explode, so only probe-term hits ever reach the (id, term) exchange
    val tf = base
      .select(col(idCol), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    scoreTopK(tf, stats, idCol, k)
  }

  /** Shared scoring tail: postings (id, dl, term, tf) + one-row stats
    * (n_docs, avgdl) → top-k. Kept identical between the scan path
    * ([[bm25TopK]]) and the index path ([[bm25FromIndex]]) so the two are
    * provably the same function of their postings. The per-term df is ≤
    * |terms| rows (postings carry one row per (doc, term)) and broadcasts;
    * the score product is the exact quotient/remainder decomposition of
    * `(idf_x1m · ratio_x1m) DIV 10^6` — the oracle keeps the naive
    * product, so the hash match proves the decomposition semantics-free
    * (cf. LinkGraph.domainRank).
    */
  private def scoreTopK(tf: DataFrame, stats: DataFrame, idCol: String, k: Int): DataFrame = {
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf_x1m", expr("((n_docs - df) * 1000000L) DIV df"))
      .withColumn("norm_x1m", expr("250000L + (750000L * dl) DIV avgdl"))
      .withColumn("ratio_x1m",
        expr("(tf * 2200000000000L) DIV (tf * 1000000L + (1200000L * norm_x1m) DIV 1000000L)"))
      .withColumn("score_x1m",
        expr("(idf_x1m DIV 1000000L) * ratio_x1m + ((idf_x1m % 1000000L) * ratio_x1m) DIV 1000000L"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms_matched"), sum(col("score_x1m")).as("score_x1m"))
      .orderBy(col("score_x1m").desc, col(idCol))
      .limit(k)
  }

  /** Build a persistent INVERTED INDEX for the write-once / query-many
    * retrieval shape: full postings (id, dl, term, tf) partitioned on a
    * term hash bucket, plus the one-row corpus stats. [[bm25TopK]] re-scans
    * and re-explodes the whole corpus per probe; at 10^12 documents that is
    * the wrong amortization for a query workload — the index pays the
    * explode ONCE, and every later probe reads only the partitions its
    * terms hash into (directory-level partition pruning at the scan,
    * PlanSpec-gated), i.e. ≤ |terms| of `termBuckets` directories.
    *
    * `termBuckets` bounds the directory fan-out (a dir per raw term would
    * be 10^8 dirs at web scale); xxhash64 keys the bucket — deterministic
    * across runs, which is all an internal layout needs (no oracle ever
    * replays the bucket id).
    */
  def buildIndex(d: DataFrame, idCol: String, textCol: String, path: String,
                 termBuckets: Int = 64): Unit = {
    require(termBuckets > 0, s"termBuckets must be positive, got $termBuckets")
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val base = d.select(col(idCol),
      when(length(trim(col(textCol))) === 0, array().cast("array<string>"))
        .otherwise(toks).as("toks"))
      .select(col(idCol), col("toks"), size(col("toks")).cast("long").as("dl"))
    base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tot"))
      .select(col("n_docs"), expr("tot DIV n_docs").as("avgdl"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
    base
      .select(col(idCol), col("dl"),
        posexplode(col("toks")).as(Seq("pos", "term")))
      .groupBy(col(idCol), col("dl"), col("term"))
      // positional postings: tf AND the sorted in-document position list,
      // so ONE index serves ranked retrieval (tf) and exact-phrase
      // queries (positions) — the standard Lucene trade, and positions
      // cost only what the tokens already cost
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos").cast("long"))).as("positions"))
      .withColumn("term_bucket", pmod(xxhash64(col("term")), lit(termBuckets.toLong)))
      .write.mode("overwrite").partitionBy("term_bucket").parquet(s"$path/postings")
  }

  /** Probe the index: same output as [[bm25TopK]] on the indexed corpus
    * (same scoring tail, identical oracle), but the scan touches only the
    * probe terms' hash-bucket partitions — the per-query cost is the index
    * lookup, not the corpus.
    */
  def bm25FromIndex(spark: SparkSession, path: String, idCol: String,
                    terms: Seq[String], k: Int, termBuckets: Int = 64): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    // derive the probe buckets with the SAME expression the writer used —
    // a hand-rolled driver-side xxhash64/pmod replica would silently
    // diverge on sign handling; |terms| rows, driver-sized
    import spark.implicits._
    val buckets = terms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(termBuckets.toLong)).as("b"))
      .distinct().as[Long].collect().toSeq
    val stats = spark.read.parquet(s"$path/stats")
    val tf = spark.read.parquet(s"$path/postings")
      .filter(col("term_bucket").isin(buckets: _*)) // partition pruning
      .filter(col("term").isin(terms: _*))
      .select(col(idCol), col("dl"), col("term"), col("tf"))
    scoreTopK(tf, stats, idCol, k)
  }

  /** The (j, term) offset relation of a phrase — broadcastable, and the
    * reason duplicate phrase terms just work: a posting at position p
    * contributes one (start = p − j, j) row per slot its term fills.
    */
  private def phraseFrame(spark: SparkSession, phrase: Seq[String]): DataFrame = {
    import spark.implicits._
    phrase.zipWithIndex.map { case (t, j) => (j.toLong, t.toLowerCase) }
      .toDF("j", "term")
  }

  /** Shared phrase tail: positional rows (id, pos, term) → documents with
    * occurrence counts. An occurrence starts at `start` ⟺ all `m` slots
    * matched, and (id, start, j) rows are unique by construction (one
    * source position per slot), so a plain count — no distinct — decides.
    */
  private def phraseTail(pos: DataFrame, ph: DataFrame,
                         idCol: String, m: Int): DataFrame =
    pos.join(broadcast(ph), Seq("term"))
      .select(col(idCol), (col("pos").cast("long") - col("j")).as("start"))
      .groupBy(col(idCol), col("start"))
      .agg(count(lit(1)).as("hits"))
      .where(col("hits") === m && col("start") >= 0)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_occ"), min(col("start")).as("first_pos"))

  /** Exact-phrase search over the corpus: documents containing the
    * adjacent token sequence `phrase`, with occurrence count and first
    * position. Relational formulation (the DuckDB-replayable one): each
    * matched posting votes for the occurrence START it would belong to
    * (`pos − slot`), and a start with all `m` slot votes is a match —
    * duplicate terms inside the phrase need no special case.
    *
    * Scale shape: the term prune to the phrase's vocabulary runs with
    * the posexplode map-side (only phrase-term postings ever shuffle);
    * the two slim exchanges carry (id, start) votes and per-doc counts.
    * Document text never shuffles.
    */
  def phraseOccurrences(d: DataFrame, idCol: String, textCol: String,
                        phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val spark = d.sparkSession
    val ph = phraseFrame(spark, phrase)
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val pos = d.select(col(idCol),
        when(length(trim(col(textCol))) === 0, array().cast("array<string>"))
          .otherwise(toks).as("toks"))
      .select(col(idCol), posexplode(col("toks")).as(Seq("pos", "term")))
      .filter(col("term").isin(phrase.map(_.toLowerCase): _*))
    phraseTail(pos, ph, idCol, phrase.length)
  }

  /** [[phraseOccurrences]] against the persistent index: the scan reads
    * only the phrase terms' hash-bucket partitions (same pruning as
    * [[bm25FromIndex]]), explodes their stored position lists, and runs
    * the identical tail — same oracle as the scan path, per-query cost
    * proportional to the phrase terms' postings, not the corpus.
    */
  def phraseFromIndex(spark: SparkSession, path: String, idCol: String,
                      phrase: Seq[String], termBuckets: Int = 64): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    import spark.implicits._
    val terms = phrase.map(_.toLowerCase).distinct
    val buckets = terms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(termBuckets.toLong)).as("b"))
      .distinct().as[Long].collect().toSeq
    val pos = spark.read.parquet(s"$path/postings")
      .filter(col("term_bucket").isin(buckets: _*)) // partition pruning
      .filter(col("term").isin(terms: _*))
      .select(col(idCol), col("term"), explode(col("positions")).as("pos"))
    phraseTail(pos, phraseFrame(spark, phrase), idCol, phrase.length)
  }
}
