package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level boilerplate removal: drop the individual LINES that repeat
  * across many documents (cookie banners, nav bars, footers, share
  * prompts) while keeping each document's unique prose — the CCNet-style
  * paragraph-hash dedup step every Common-Crawl-derived corpus applies
  * before document-level dedup. The reference strips boilerplate only
  * WITHIN one page's DOM (`/root/reference/src/main.py` processes a
  * single document per request and never sees the corpus); this operator
  * is the corpus-level complement: a line is boilerplate because it
  * recurs across the crawl, not because of where it sits in the markup.
  *
  * Frequency is DOCUMENT frequency (distinct documents containing the
  * line), not occurrence count, so a single spammy document repeating its
  * own line cannot promote that line into the catalog and self-clean.
  *
  * Scale shape (10^12 documents):
  *  1. catalog build — documents explode to slim (id, line_md5) pairs
  *     (16+8 bytes each, never the text), partially aggregated map-side
  *     twice (distinct, then per-hash doc counts); only hashes shuffle.
  *  2. The catalog is BOUNDED by construction: `HAVING df >= minDf` plus
  *     a deterministic `ORDER BY (df DESC, hash) LIMIT maxCatalog` cap —
  *     a crawl's boilerplate vocabulary is small, and the cap keeps an
  *     adversarial corpus from blowing the broadcast. It collapses into
  *     ONE array row and broadcasts (BroadcastNestedLoopJoin of a 1-row
  *     side).
  *  3. cleanse — map-only over the corpus: `filter(split(text), x ->
  *     !array_contains(catalog, md5(x)))` keeps line order and repeated
  *     unique lines, touching each document exactly once with no text
  *     shuffle. (The alternative — explode + anti-join + re-group —
  *     shuffles the whole corpus text twice; rejected.)
  *
  * Engine-portable by construction: md5 hex of the raw line on both
  * engines, integer df threshold, order-preserving array filter — the
  * DuckDB oracle (`list_filter`/`list_contains`) hash-matches exactly.
  */
object LineDedup {

  /** Boilerplate catalog: (line_md5, df) for lines contained in at least
    * `minDf` distinct documents, deterministically capped to the
    * `maxCatalog` most frequent (ties broken by hash).
    */
  def frequentLines(df: DataFrame, idCol: String, textCol: String,
                    minDf: Long, maxCatalog: Int = 100000): DataFrame =
    df.select(col(idCol).as("_id"), explode(split(col(textCol), "\n")).as("line"))
      .select(col("_id"), md5(col("line").cast("binary")).as("line_md5"))
      .distinct()
      .groupBy(col("line_md5"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
      .orderBy(col("df").desc, col("line_md5"))
      .limit(maxCatalog)

  /** Per-document cleanse against the frequent-line catalog. Emits
    * (idCol, n_lines, n_kept, clean_text) with the surviving lines
    * re-joined by newline in original order.
    */
  def dropFrequentLines(df: DataFrame, idCol: String, textCol: String,
                        minDf: Long, maxCatalog: Int = 100000): DataFrame = {
    val catalog = frequentLines(df, idCol, textCol, minDf, maxCatalog)
      .agg(collect_list(col("line_md5")).as("boiler"))
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, x => !array_contains(col("boiler"), md5(x.cast("binary"))))
    df.crossJoin(broadcast(catalog))
      .select(
        col(idCol),
        size(lines).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept"),
        array_join(kept, "\n").as("clean_text"))
  }
}
