package graft.sample

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quality tiering — split a corpus into equal-mass tiers by a
  * per-document integer score (the CCNet recipe: score every page with a
  * reference language model, then cut the corpus into head / middle /
  * tail thirds and train preferentially on the head).
  *
  * Boundaries are EXACT discrete quantiles of the score distribution,
  * computed from a score histogram rather than a global sort: tier k's
  * lower boundary is the smallest score whose cumulative count reaches
  * `ceil(k·n / numTiers)`. The comparison is kept in integers as
  * `cum · numTiers >= k · n` (for positive integers,
  * `cum >= ceil(a/T)  ⟺  T·cum >= a`), so there is no division to
  * round differently across engines — the DuckDB oracle replays the
  * same product comparison bit-for-bit.
  *
  * Ties share a tier: every document with the boundary score lands on
  * the LOW side (a document's tier is a function of its score alone,
  * never of a sort position), so tier masses are exact thirds only up to
  * tie mass — the honest discrete-quantile semantics. A degenerate
  * corpus where one score carries most of the mass collapses the upper
  * tiers to empty rather than splitting a tie arbitrarily. NULL scores
  * (none in the gated pipelines — the LM score is total) compare null
  * against every boundary and deterministically land in tier 0.
  *
  * Scale shape: one slim aggregation builds the histogram (distinct
  * integer scores — for ppm-style scores at most ~1e6 rows however large
  * the corpus is); the cumulative walk is a single-partition window over
  * that bounded histogram, never over the corpus; the boundary row is a
  * 1-row aggregate broadcast back; assignment is a map-only comparison
  * chain. Documents never shuffle, and the filter/pruning below the
  * score projection still reaches the scan.
  */
object Tiering {

  /** One boundary column `b_k` per internal cut (k = 1..numTiers-1):
    * the smallest score whose cumulative count reaches k/numTiers of the
    * corpus — i.e. the top score of tier k-1 counted from the bottom.
    * Always exactly one row; `b_k` is null only on an empty input.
    */
  def tierBoundaries(df: DataFrame, scoreCol: String, numTiers: Int): DataFrame = {
    require(numTiers >= 2, s"numTiers must be >= 2, got $numTiers")
    val hist = df.groupBy(col(scoreCol).as("graft_s"))
      .agg(count(lit(1)).as("graft_c"))
    // bounded-histogram window: ~|distinct scores| rows, not corpus rows
    val cumW = Window.orderBy(col("graft_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allW = Window.partitionBy(lit(1))
    val cum = hist.select(
      col("graft_s"),
      sum(col("graft_c")).over(cumW).as("graft_cum"),
      sum(col("graft_c")).over(allW).as("graft_n"))
    cum.agg(
      min(when(col("graft_cum") * numTiers >= col("graft_n"), col("graft_s"))).as("b_1"),
      (2 until numTiers).map(k =>
        min(when(col("graft_cum") * numTiers >= col("graft_n") * k, col("graft_s"))).as(s"b_$k")): _*)
  }

  /** Adds `tierCol`: 0 = bottom tier (lowest scores) .. numTiers-1 = top.
    * tier = number of boundaries strictly below the score, so boundary
    * ties land low (see class doc). Map-only after the broadcast of the
    * 1-row boundary table.
    */
  def assignTiers(df: DataFrame, scoreCol: String, numTiers: Int = 3,
      tierCol: String = "tier"): DataFrame = {
    val bounds = tierBoundaries(df, scoreCol, numTiers)
    val tier = (1 until numTiers)
      .map(k => when(col(scoreCol) > col(s"b_$k"), 1).otherwise(0))
      .reduce(_ + _)
    df.crossJoin(broadcast(bounds))
      .withColumn(tierCol, tier)
      .drop((1 until numTiers).map(k => s"b_$k"): _*)
  }
}
