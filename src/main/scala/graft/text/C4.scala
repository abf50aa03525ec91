package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The C4 cleaning recipe (Raffel et al. 2020, §2.2 "Colossal Clean
  * Crawled Corpus") — the other canonical web-text gate next to Gopher
  * ([[TextAnalytics.isGopherQuality]]): where Gopher scores a page on
  * aggregate statistics, C4 cleans LINE BY LINE and then gates the page
  * on what survives. Rules, as published:
  *
  *   - keep only lines ending in a terminal punctuation mark (. ! ? ")
  *   - keep only lines with ≥ 5 words
  *   - drop any line containing the word "javascript" (cookie/JS
  *     boilerplate notices)
  *   - drop the whole page if the cleaned text has < 3 sentences
  *   - drop the whole page if it contains any word from a bad-word list
  *     (word-boundary match on whitespace-normalized lowercase)
  *   - drop the whole page on "lorem ipsum" (template placeholder) or a
  *     curly brace (code, not prose)
  *
  * Sentences are approximated as terminal-mark occurrences in the cleaned
  * text — the published pipeline used a language-specific splitter; the
  * count differs only on abbreviation-heavy prose and the gate is a ≥ 3
  * floor, so the approximation is documented rather than material.
  *
  * Scale shape: entirely map-only — one codegen'd projection over the
  * scan (split + array filter + counters); the bad-word list folds into
  * the compiled predicate (it is a fixed vocabulary, not data), so there
  * is no join and nothing shuffles. Composes with the clean-corpus
  * pipeline's staged-projection pattern.
  */
object C4 {

  /** Per-line C4 keep predicate (see object doc). */
  def lineKeep(line: Column): Column = {
    val t = trim(line)
    (length(t) > 0) &&
      t.rlike("[.!?\"]$") &&
      (size(split(t, "\\s+")) >= 5) &&
      !contains(lower(t), lit("javascript"))
  }

  /** Cleaning + page-gate statistics: one row per input row with
    * (n_lines, n_kept, n_sentences, has_badword, keep, cleaned_fp).
    */
  def c4Stats(df: DataFrame, idCol: String, textCol: String,
              badwords: Seq[String]): DataFrame = {
    require(badwords.nonEmpty, "badwords must not be empty")
    val t = col(textCol)
    val lines = split(t, "\n")
    val kept = filter(lines, lineKeep _)
    val cleaned = array_join(kept, "\n")
    val padded = concat(lit(" "), regexp_replace(lower(t), "\\s+", " "), lit(" "))
    val hasBad = badwords.map(w => contains(padded, lit(s" $w "))).reduce(_ || _)
    val nSent = (length(cleaned) - length(regexp_replace(cleaned, "[.!?]", ""))).cast("long")
    df.select(
      col(idCol),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      nSent.as("n_sentences"),
      hasBad.as("has_badword"),
      (nSent >= 3L && !hasBad &&
        !contains(lower(t), lit("lorem ipsum")) &&
        !contains(t, lit("{"))).as("keep"),
      md5(cleaned).as("cleaned_fp"))
  }
}
