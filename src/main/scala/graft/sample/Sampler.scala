package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the downsampling step of a
  * training-data pipeline (per-source/per-language mixture control).
  *
  * The keep/drop decision is a pure function of the document id: the
  * first 8 hex chars of `md5(id)` read as an integer modulo 10 000 give
  * a uniform bucket in [0, 10000), and a document survives iff its
  * bucket is below the stratum's rate in basis points. md5 (not
  * xxhash64) so the decision is reproducible in any engine — the DuckDB
  * oracle replays it exactly — and stable across Spark versions.
  *
  * Scale shape: the rates table is tiny (one row per stratum) and
  * broadcast, so sampling is a map-only filter over the corpus — zero
  * shuffle of document rows, filter and pruning push to the scan, and
  * the output keeps the input's partitioning. Changing the mixture
  * re-reads nothing but the rates.
  */
object Sampler {

  /** Uniform bucket in [0, 10000) derived from the id via md5 — engine
    * portable (`conv(substr(md5, 1, 8), 16, 10) % 10000`).
    */
  def bucket10k(id: Column): Column =
    (conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % 10000).cast("int")

  /** Keep rows whose md5 bucket falls under their stratum's rate.
    *
    * @param rates one row per stratum: the join keys in `strataCols`
    *              plus `rate_bp` (basis points in [0, 10000]); must be
    *              small — it is broadcast.
    */
  def sampleStratified(docs: DataFrame, rates: DataFrame, idCol: String,
      strataCols: Seq[String]): DataFrame =
    docs.join(broadcast(rates), strataCols)
      .where(bucket10k(col(idCol)) < col("rate_bp"))
}
