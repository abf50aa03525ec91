package graft.web

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Templated-page detection via DOM-skeleton fingerprinting: two pages
  * share a template iff their tag sequences (element names in document
  * order, attributes and text ignored) are identical. CMS-generated
  * families — listing pages, product pages, forum threads — collapse to a
  * handful of fingerprints, which is the corpus-curation signal the
  * text-level dedup family cannot see: templated pages share STRUCTURE
  * while their visible text differs, so neither exact dedup (md5 of text)
  * nor MinHash/SimHash groups them. The reference has no corpus-level
  * analog (single-document model, `/root/reference/src/core/pipeline.py:39-47`);
  * this is the reference's layout analysis generalized to the corpus axis.
  *
  * Scale shape: the skeleton harvest is a map-only codegen'd
  * `regexp_extract_all` over the raw markup — the payload column never
  * shuffles. Only slim (32-hex fingerprint, id, tag count) rows reach the
  * one group-by exchange, which gets a map-side partial; at 10^12 pages
  * the shuffled bytes are the fingerprints, not the pages.
  */
object Templates {

  /** Element names in document order, lowercased. Open tags only: the
    * closing-tag sequence is determined by the opening sequence for
    * well-formed markup, and real-world unclosed tags (`<br>`, `<li>`)
    * would otherwise split one rendered template into spurious variants.
    */
  def tagSkeleton(html: Column): Column =
    regexp_extract_all(lower(html), lit("<([a-z][a-z0-9]*)"), lit(1))

  /** Per-page fingerprint row: (id, template_fp, n_tags). The fingerprint
    * is the md5 of the comma-joined skeleton — a 32-hex shuffle key, same
    * discipline as [[graft.dedup.Dedup.exactGroups]].
    */
  def templateFingerprint(pages: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val tags = tagSkeleton(col(htmlCol))
    pages.select(col(idCol),
      md5(array_join(tags, ",")).as("template_fp"),
      size(tags).cast("long").as("n_tags"))
  }

  /** Template families with at least `minPages` members: one row per
    * fingerprint with the family size, the smallest member id as the
    * deterministic representative, and the (family-constant) tag count.
    */
  def templateGroups(pages: DataFrame, idCol: String, htmlCol: String,
                     minPages: Long = 2L): DataFrame =
    templateFingerprint(pages, idCol, htmlCol)
      .groupBy(col("template_fp"))
      .agg(count(lit(1)).as("n_pages"),
        min(col(idCol)).as("rep_id"),
        // family-constant by construction (same skeleton ⇒ same length);
        // max is the agg that lets the partial stay map-side
        max(col("n_tags")).as("n_tags"))
      .filter(col("n_pages") >= minPages)
}
