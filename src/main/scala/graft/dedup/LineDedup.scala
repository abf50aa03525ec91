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

  /** Cross-document paragraph dedup, FIRST OCCURRENCE WINS (the
    * RefinedWeb rule): a paragraph occurrence `(doc, pos)` survives iff
    * it is the corpus-wide first occurrence of its content hash in
    * `(id, pos)` order — later copies are removed IN PLACE while the
    * documents stay. This is the other half of line-level cleansing:
    * [[dropFrequentLines]] removes lines that are boilerplate BY
    * FREQUENCY (df ≥ threshold, bounded catalog); this removes EVERY
    * later copy of ANY duplicated paragraph, including a 2-document
    * near-syndication the frequency threshold deliberately ignores — and
    * a document repeating its own paragraph keeps only the earliest.
    * Emits (idCol, n_paras, n_kept, clean_text), order preserved.
    *
    * Scale shape (10^12 documents):
    *  1. occurrences explode to slim (fp, id, pos) triples — md5 hex +
    *     two longs, never the text; the first-occurrence reduce is a
    *     map-side-partial `min(struct(id, pos))` per fp (hash-keyed
    *     exchange of slim rows).
    *  2. the DROP set (non-first occurrences) collapses per document
    *     into one (id, sorted drop-positions array) row — bounded by the
    *     document's own paragraph count, tiny for the overwhelmingly
    *     non-duplicated majority (absent row = keep everything).
    *  3. cleanse is a doc-keyed LEFT join of that slim drop relation
    *     followed by a map-only positional `filter` + rejoin. Unlike the
    *     frequent-line catalog the drop relation is NOT globally bounded
    *     (it lists every duplicated occurrence), so this is a keyed join
    *     (AQE broadcasts it when small), not a 1-row broadcast — the
    *     honest cost of exact first-wins semantics; document text still
    *     moves at most once and never through an exchange keyed by
    *     anything but its own id.
    *
    * Engine-portable: md5 hex of the raw paragraph, lexicographic
    * struct-min for "first", 0-based positions — the DuckDB oracle
    * replays all three exactly.
    */
  def dropDupParagraphs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val occ = df
      .select(col(idCol).as("_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "para")))
      .select(col("_id"), col("pos").cast("long").as("pos"),
        md5(col("para").cast("binary")).as("fp"))
    val first = occ.groupBy(col("fp"))
      .agg(min(struct(col("_id").as("d"), col("pos").as("p"))).as("f"))
    val drops = occ.join(first, "fp")
      .where(col("_id") =!= col("f.d") || col("pos") =!= col("f.p"))
      .groupBy(col("_id"))
      .agg(sort_array(collect_list(col("pos"))).as("drop_pos"))
    val paras = split(col(textCol), "\n")
    val kept = filter(paras, (x, i) =>
      !coalesce(array_contains(col("drop_pos"), i.cast("long")), lit(false)))
    df.join(drops, col(idCol) === col("_id"), "left")
      .select(
        col(idCol),
        size(paras).cast("long").as("n_paras"),
        size(kept).cast("long").as("n_kept"),
        array_join(kept, "\n").as("clean_text"))
  }

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
