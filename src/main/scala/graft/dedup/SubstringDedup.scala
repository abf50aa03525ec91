package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalytics

/** Exact duplicated-SUBSTRING dedup (the ExactSubstr rule of Lee et al.
  * 2021, "Deduplicating Training Data Makes Language Models Better"):
  * instead of dropping whole documents (exact/near dedup) or whole lines
  * (the CCNet catalog in [[LineDedup]]), remove the duplicated token SPANS
  * in place and keep the unique remainder of every document. The unit of
  * duplication is a k-token window: a position is duplicated iff the
  * k-gram starting there occurs anywhere else in the corpus earlier in
  * (doc, pos) order — FIRST OCCURRENCE WINS, exactly one copy of every
  * duplicated passage survives, including self-repeats within one
  * document. Runs of duplicated starts merge into maximal spans
  * [start, end+k-1], so a 200-token syndicated insert shows up as ONE span,
  * not 193 overlapping windows.
  *
  * The reference deduplicates nothing (one document per request,
  * `/root/reference/src/core/pipeline.py` has no corpus view); this is the
  * corpus-scale operator every trained-on-crawl pipeline applies between
  * line-level cleansing and document-level near-dedup.
  *
  * Scale shape (10^12 documents):
  *  1. k-gram occurrences explode to slim (fp, id, pos) triples — a 32-char
  *     md5 hex plus two longs, never the text; the first-occurrence reduce
  *     is a map-side-partial `min(struct(id, pos))` per fp, ONE fp-keyed
  *     exchange (the join-back to tag non-first occurrences reuses the same
  *     key, AQE plans it off the same exchange).
  *  2. only DUPLICATED positions — empty for the overwhelmingly unique
  *     majority of a deduplicated crawl — flow into the per-document
  *     gaps-and-islands merge (ONE doc-keyed exchange of slim (id, pos)
  *     rows; the window is per-document, never global).
  *  3. span removal is a doc-keyed LEFT join of the bounded per-doc span
  *     array followed by a map-only positional token filter: document text
  *     moves at most once, keyed only by its own id.
  *
  * Engine-portable by construction: whitespace tokens, space-joined
  * k-grams, md5 hex fingerprints, lexicographic struct-min for "first",
  * 0-based positions — the DuckDB oracle replays every step exactly.
  */
object SubstringDedup {

  /** Maximal duplicated spans per document:
    * (idCol, span_start, span_end, span_tokens, n_dup_grams) with token
    * indices 0-based inclusive. A document with no duplicated k-gram emits
    * no row. `span_tokens = span_end - span_start + 1`; `n_dup_grams` is
    * the number of duplicated window starts merged into the span.
    */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 8): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val occ = df
      .select(col(idCol).as("_id"),
        posexplode(Dedup.shingles(col(textCol), k)).as(Seq("pos", "g")))
      .select(col("_id"), col("pos").cast("long").as("pos"),
        md5(col("g").cast("binary")).as("fp"))
    val first = occ.groupBy(col("fp"))
      .agg(min(struct(col("_id").as("d"), col("pos").as("p"))).as("f"))
    val dups = occ.join(first, "fp")
      .where(col("_id") =!= col("f.d") || col("pos") =!= col("f.p"))
      .select(col("_id"), col("pos"))
    // gaps-and-islands: consecutive duplicated starts share (pos - rank)
    val w = Window.partitionBy(col("_id")).orderBy(col("pos"))
    dups
      .withColumn("isl", col("pos") - row_number().over(w))
      .groupBy(col("_id"), col("isl"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k - 1).cast("long")).as("span_end"),
        count(lit(1)).as("n_dup_grams"))
      .select(col("_id").as(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + lit(1L)).as("span_tokens"),
        col("n_dup_grams"))
  }

  /** In-place span removal: every token covered by a duplicated span is
    * dropped, the remainder re-joined by single spaces in original order
    * (the token-stream rebuild — original whitespace is not preserved,
    * matching Lee et al.'s token-level semantics). Emits
    * (idCol, n_tokens, n_kept, clean_text); documents with no duplicated
    * span pass through whole (modulo whitespace normalization).
    */
  def dropDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                          k: Int = 8): DataFrame = {
    val perDoc = duplicatedSpans(df, idCol, textCol, k)
      .groupBy(col(idCol).as("_id"))
      .agg(collect_list(struct(col("span_start").as("a"), col("span_end").as("b"))).as("sp"))
    val toks = TextAnalytics.tokens(col(textCol))
    val covered = (i: org.apache.spark.sql.Column) =>
      coalesce(exists(col("sp"), s =>
        s.getField("a") <= i && i <= s.getField("b")), lit(false))
    val kept = filter(toks, (_, i) => !covered(i.cast("long")))
    df.join(perDoc, col(idCol) === col("_id"), "left")
      .select(
        col(idCol),
        size(toks).cast("long").as("n_tokens"),
        size(kept).cast("long").as("n_kept"),
        array_join(kept, " ").as("clean_text"))
  }
}
