package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents whose text overlaps
  * an evaluation set by at least one word n-gram (the GPT-3/FLAN-style
  * n-gram overlap rule; n = 8 by default — long enough that chance
  * collisions are negligible, short enough to catch quoted excerpts).
  *
  * A training corpus that contains eval-set text inflates benchmark scores;
  * the standard hygiene step is to drop (or at least flag) every training
  * document sharing any long n-gram with any eval document. This is the
  * corpus-scale complement of [[Dedup]]: near-dup removal dedups the corpus
  * against itself, decontamination dedups it against a small external set.
  *
  * Scale shape (the part that matters at 10^12 rows):
  *  - the EVAL side is small (benchmarks are thousands of documents) — its
  *    distinct n-gram hashes are broadcast, never shuffled;
  *  - the CORPUS side explodes its per-document n-gram SET (deduplicated
  *    row-locally with `array_distinct` — no shuffle) into slim
  *    `(id, 32-hex md5)` rows and probes the broadcast hash set as a
  *    map-side equi-join;
  *  - the only shuffle in the whole operator is the final `groupBy(id)`
  *    over MATCHED rows — contaminated documents are rare, so the exchange
  *    is a few thousand rows regardless of corpus size;
  *  - documents themselves never move; the flagged-id set is then applied
  *    with a broadcast anti-join ([[dropContaminated]]).
  */
object Decontaminate {

  /** Distinct per-document n-gram hashes as slim (id, gh) rows.
    * `array_distinct` runs row-locally so within-document repeats never
    * reach the join; md5 keeps the probe key at 32 chars regardless of n.
    * Shared with [[Dedup.frequentGramStats]] — the gram key definition
    * must stay identical across the passage-level operators.
    */
  private[dedup] def ngramHashes(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"), explode(Dedup.shingleSet(col(textCol), n)).as("g"))
      .select(col("id"), md5(col("g")).as("gh"))

  /** (doc_id, n_overlap): corpus documents sharing ≥ 1 word n-gram with the
    * eval set, with the count of distinct overlapping n-grams. `bench` is
    * any DataFrame with a text column (the eval/benchmark documents).
    */
  def overlap(corpus: DataFrame, idCol: String, textCol: String,
              bench: DataFrame, benchTextCol: String, n: Int = 8): DataFrame = {
    val benchGrams = bench
      .select(explode(Dedup.shingleSet(col(benchTextCol), n)).as("g"))
      .select(md5(col("g")).as("gh"))
      .distinct()
    ngramHashes(corpus, idCol, textCol, n)
      .join(broadcast(benchGrams), Seq("gh"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_overlap"))
      .withColumnRenamed("id", idCol)
  }

  /** Span-LOCALIZED decontamination: not just whether a training document
    * overlaps the eval set but WHERE — the per-doc gram-position envelope
    * of the matches. Whole-document removal throws away a long page over
    * one quoted benchmark question; with the span in hand a pipeline can
    * excise the contaminated passage and keep the rest (the
    * RefinedWeb/FineWeb-style surgical option). Output per contaminated
    * doc: matched-position count, first/last matching gram position, and
    * the token length of the envelope (`last − first + n`).
    *
    * Scale shape: identical to [[overlap]] except the corpus side keeps
    * POSITIONS (ordered posexplode instead of the distinct set — repeats
    * of a benchmark gram inside one doc are separate hits by design);
    * eval grams broadcast, matches are rare, the per-doc agg shuffles a
    * few thousand slim rows regardless of corpus size.
    */
  def overlapSpans(corpus: DataFrame, idCol: String, textCol: String,
                   bench: DataFrame, benchTextCol: String, n: Int = 8): DataFrame = {
    val benchGrams = bench
      .select(explode(Dedup.shingleSet(col(benchTextCol), n)).as("g"))
      .select(md5(col("g")).as("gh"))
      .distinct()
    corpus
      .select(col(idCol), posexplode(Dedup.shingles(col(textCol), n)).as(Seq("pos", "g")))
      .select(col(idCol), col("pos").cast("long").as("pos"), md5(col("g")).as("gh"))
      .join(broadcast(benchGrams), Seq("gh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"),
        min(col("pos")).as("first_gram"),
        max(col("pos")).as("last_gram"))
      .withColumn("span_tokens", col("last_gram") - col("first_gram") + lit(n.toLong))
  }

  /** Corpus minus every document flagged by [[overlap]] — broadcast
    * anti-join on the (small) contaminated-id set.
    */
  def dropContaminated(corpus: DataFrame, idCol: String, textCol: String,
                       bench: DataFrame, benchTextCol: String, n: Int = 8): DataFrame = {
    val bad = overlap(corpus, idCol, textCol, bench, benchTextCol, n).select(col(idCol))
    corpus.join(broadcast(bad), Seq(idCol), "left_anti")
  }
}
