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
