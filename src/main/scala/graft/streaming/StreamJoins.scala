package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM-STREAM join — the last streaming shape the engine's
  * surface needed next to windowed aggs ([[StreamingExtract.windowedMetrics]]),
  * keyed state ([[StreamingExtract.duplicateCounts]]), session windows
  * ([[StreamingExtract.sessionMetrics]]) and within-watermark dedup: two
  * live streams joined on a key within a bounded event-time window
  * (click→view attribution, fetch→robots-change exposure, impression→
  * conversion). The reference has no streaming at all; this is the
  * composition its SSE batch endpoint could never express.
  *
  * Scale/state story: the time-range predicate lives INSIDE the join
  * condition, which is what lets Spark's symmetric-hash stream-stream
  * join expire state — a right row is dropped once the left watermark
  * passes `r.ts + horizon`, a left row once the right watermark passes
  * its ts, so each side's state is horizon × arrival-rate, never stream
  * length. Both watermarks are mandatory for exactly that reason (an
  * unwatermarked stream-stream join grows state forever and Spark
  * rejects it in append mode).
  */
object StreamJoins {

  /** Inner attribution join: every (left, right) pair with equal `keyCol`
    * and `r.ts ∈ [l.ts − horizonSec, l.ts]` (inclusive — a view at the
    * click instant attributes). Emits ALL qualifying right rows per left
    * row — the attribution contract; the batch as-of join keeps only the
    * latest (use [[graft.events.EventOps.asofJoin]] for that offline).
    *
    * `lTs`/`rTs` must be distinct TIMESTAMP column names; non-key,
    * non-time column names must not collide (rename on the way in, same
    * contract as the batch joins here).
    */
  def windowedPairs(left: DataFrame, right: DataFrame, keyCol: String,
                    lTs: String, rTs: String, horizonSec: Long,
                    lWatermark: String = "1 hour",
                    rWatermark: String = "1 hour"): DataFrame = {
    require(lTs != rTs, "left and right time columns must have distinct names")
    require(horizonSec >= 0, s"horizonSec must be non-negative, got $horizonSec")
    val l = left.withWatermark(lTs, lWatermark)
    val r = right.withWatermark(rTs, rWatermark).withColumnRenamed(keyCol, "_graft_rk")
    l.join(r,
        col(keyCol) === col("_graft_rk") &&
          col(rTs) <= col(lTs) &&
          col(rTs) >= col(lTs) - expr(s"interval $horizonSec seconds"))
      .drop("_graft_rk")
  }

  /** STREAM-STATIC enrichment join — the dimension-lookup shape a live
    * ingest runs on every micro-batch: the unbounded page stream joins a
    * bounded, slowly-changing relation (domain blocklist, domain rank,
    * robots verdicts) that is BROADCAST, so the stream side never
    * shuffles and no join state accumulates at all (the static side is
    * re-resolvable per batch; Spark keeps zero state for stream-static
    * joins — that is the point of using one instead of a stream-stream
    * join against a compacted dimension stream).
    *
    * `how` = "inner" keeps only matched rows (a keep-list);
    * "left_anti" drops them (a blocklist); "left" enriches with the
    * dimension's columns, nulls where absent. No watermark needed — the
    * static side cannot make state grow.
    */
  def joinStatic(stream: DataFrame, dim: DataFrame, keyCol: String,
                 how: String = "left"): DataFrame = {
    require(Set("inner", "left", "left_anti").contains(how),
      s"how must be inner/left/left_anti, got $how")
    stream.join(broadcast(dim), Seq(keyCol), how)
  }
}
