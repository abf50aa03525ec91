package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunk dedup — the cross-crawl passage detector that
  * survives INSERTIONS.
  *
  * Fixed n-gram passage dedup ([[Dedup.frequentGramStats]],
  * [[SubstringDedup]]) aligns on token windows; an injected ad, cookie
  * banner, or timestamp early in a re-crawled page shifts every later
  * window, so nothing downstream of the edit matches. CDC chunking
  * (rsync/LBFS lineage — see [[graft.functions.CdcCuts]]) derives chunk
  * boundaries from content, so a local edit perturbs only the chunks
  * within ~w code points of it and every later chunk re-aligns
  * bit-identically: chunk-hash equality then finds the shared passages
  * regardless of offset. This is the storage/transfer dedup trick
  * (restic, borg, data-lake delta encoding) applied to corpus curation.
  *
  * Scale shape: [[chunks]] is MAP-ONLY — the native codegen'd
  * `graft_cdc_cuts` rolls the O(n) hash in one pass, the explode is
  * row-local, and only slim (id, idx, start, len, 32-hex md5) rows leave
  * the stage (text itself never shuffles). [[sharedChunks]] adds one
  * chunk-hash aggregate with map-side partials — the standard slim-key
  * exchange every dedup family here uses.
  */
object CdcDedup {

  /** Per-document CDC chunks: `(id, chunk_idx, start_cp, len_cp,
    * chunk_md5)`; positions are 1-based CODE POINTS, chunks partition the
    * text exactly (concatenation restores it). Empty text yields no rows.
    * `w` is the rolling window, `divisor` the cut gate (expected chunk
    * length ≈ divisor code points).
    */
  def chunks(df: DataFrame, idCol: String, textCol: String,
             w: Int = 16, divisor: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol).as("id"), col(textCol).as("_t"))
      .filter(length(col("_t")) > 0)
      .withColumn("_cuts",
        call_function(graft.functions.GraftFunctions.CdcCutsName,
          col("_t"), lit(w), lit(divisor)))
      .withColumn("_n", length(col("_t")))
      // bounds = 0, cuts…, and the end-of-text sentinel unless the last
      // cut already lands there
      .withColumn("_bounds", expr(
        "concat(array(0), _cuts, " +
          "IF(size(_cuts) = 0 OR element_at(_cuts, -1) <> _n, array(_n), array()))"))
      .select(col("id"), col("_t"),
        posexplode(expr(
          "transform(sequence(1, size(_bounds) - 1), " +
            "i -> struct(element_at(_bounds, i) AS st, element_at(_bounds, i + 1) AS en))"))
          .as(Seq("_pos", "_c")))
      .select(col("id"),
        col("_pos").cast("long").as("chunk_idx"),
        (col("_c.st") + 1).cast("long").as("start_cp"),
        (col("_c.en") - col("_c.st")).cast("long").as("len_cp"),
        md5(expr("substring(_t, _c.st + 1, _c.en - _c.st)")).as("chunk_md5"))
  }

  /** Cross-version chunk delta — the storage/transfer payoff CDC exists
    * for: given two crawls of the same documents, how much of each new
    * version is REUSED chunks (already in the store from version 1) vs
    * genuinely new bytes. Per version-2 document: chunk count, new-chunk
    * count, code points total/new, and `reuse_ppm` — the delta-encoding
    * ratio (restic/borg dedup factor; for a prefix-edited page CDC keeps
    * reuse near 10^6 where fixed-offset chunking would report ~0).
    * A version-2 chunk is reused iff ITS OWN document's version-1 chunk
    * set contains the hash (per-document store semantics — the
    * corpus-wide variant is [[sharedChunks]] over the union).
    *
    * Scale shape: two map-only chunk passes, one slim (id, md5)
    * distinct, one (id, md5)-keyed left join of slim rows, one per-id
    * aggregate — text never shuffles.
    */
  def versionDelta(v1: DataFrame, v2: DataFrame, idCol: String, textCol: String,
                   w: Int = 16, divisor: Int = 64): DataFrame = {
    val old1 = chunks(v1, idCol, textCol, w, divisor)
      .select(col("id"), col("chunk_md5")).distinct()
      .withColumn("_seen", lit(1))
    chunks(v2, idCol, textCol, w, divisor)
      .join(old1, Seq("id", "chunk_md5"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("_seen").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(col("len_cp")).as("cp_total"),
        sum(when(col("_seen").isNull, col("len_cp")).otherwise(0L)).as("cp_new"))
      .select(col("id"), col("n_chunks"), col("n_new"), col("cp_total"), col("cp_new"),
        expr("(cp_total - cp_new) * 1000000 DIV cp_total").as("reuse_ppm"))
  }

  /** Chunks shared across documents: `(chunk_md5, n_docs, n_occurrences)`
    * for every chunk hash on ≥ 2 distinct documents — the candidate
    * shared-passage catalog a cross-crawl dedup or delta-storage layer
    * consumes.
    */
  def sharedChunks(chunkRows: DataFrame): DataFrame =
    chunkRows.groupBy(col("chunk_md5"))
      .agg(countDistinct(col("id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= 2)
}
