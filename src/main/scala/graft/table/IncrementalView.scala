package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained AGGREGATE VIEW over a [[SnapshotTable]] —
  * the materialized-view pattern that keeps corpus statistics fresh
  * without rescanning the corpus: each refresh reads ONLY the rows
  * appended since the last covered source version
  * ([[SnapshotTable.readAppendsSince]]), aggregates the delta, merges it
  * with the stored view state, and upserts per group (latest-wins). At
  * 10^12 source rows the per-refresh cost is O(|delta| + |groups|),
  * while a naive recompute pays the full scan every time.
  *
  * The maintained aggregate is (count, sum) per group — both algebraic,
  * so delta-merge is exact: `merged = Σ(prev, delta)` per key. The last
  * covered source version rides in the view's commit id (`upto-<V>`), so
  * the view is self-describing and resumable: a killed refresh leaves
  * the previous watermark committed, and the retry re-reads the same
  * delta idempotently (upsert per group — re-applying the same merge is
  * a no-op in value).
  *
  * Precondition (documented, required): the SOURCE must be append-only
  * between refreshes — `readAppendsSince` is the append STREAM and never
  * applies equality deletes (same contract Iceberg's incremental read
  * documents). Crawl/extraction result tables are append-only by
  * construction; for upserting sources, recompute instead.
  */
final class IncrementalView(
    val sourceRoot: String, val viewRoot: String,
    val groupCol: String, val valueCol: String) {

  private def source = new SnapshotTable(sourceRoot)
  private def view = new SnapshotTable(viewRoot)

  private val CommitPrefix = "upto-"

  /** The source version the view currently covers (0 = nothing yet). */
  def coveredVersion: Int =
    view.latest().flatMap(_.commitIds.lastOption)
      .map(_.stripPrefix(CommitPrefix).toInt).getOrElse(0)

  /** The view contents: (group, n_rows, sum_value) per group. */
  def read(spark: SparkSession): Option[DataFrame] = view.read(spark)

  private def aggOf(df: DataFrame): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), sum(col(valueCol)).cast("long").as("sum_value"))

  /** Refresh to the source's latest version. Returns the newly covered
    * version, or None when the view is already current. Reads only the
    * delta; the merge touches the (small) view state, never the source.
    */
  def refresh(spark: SparkSession): Option[Int] = {
    val cur = source.latest().map(_.version).getOrElse(0)
    val since = coveredVersion
    if (cur <= since) return None
    // bounded to `cur`: a source append landing between latest() above
    // and this read must NOT fold into a state committed as upto-<cur> —
    // the next refresh re-reads (cur, latest] and would double-count it
    val delta = source.readAppendsSince(spark, since, untilVersion = cur) match {
      // delete-only commits append nothing: the view values are already
      // right, and leaving the watermark put costs nothing on retry
      case None => return None
      case Some(d) => d
    }
    val deltaAgg = aggOf(delta)
    val merged = view.read(spark) match {
      case None => deltaAgg
      case Some(prev) =>
        prev.unionByName(deltaAgg)
          .groupBy(col(groupCol))
          .agg(sum(col("n_rows")).cast("long").as("n_rows"),
            sum(col("sum_value")).cast("long").as("sum_value"))
    }
    view.upsert(merged, s"$CommitPrefix$cur", Seq(groupCol))
    Some(cur)
  }
}
