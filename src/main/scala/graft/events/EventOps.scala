package graft.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the crawl/interaction log shape
  * `(event_id, ts, user_id, ...)` — the batch twins of what a crawl
  * scheduler runs over fetch logs: gap-based sessionization and the
  * "latest version as of T wins" pick (the recency dedup a re-crawling
  * pipeline applies per url before extraction; cf. the reference's
  * single-version-per-request model, `/root/reference/src/core/pipeline.py:39-47`,
  * which never sees two crawls of one document).
  *
  * Scale notes (both ops):
  *   - exactly ONE shuffle, on the entity key (`user_id`); at 10^12 events
  *     that key is the natural partitioner and AQE handles hot entities.
  *   - timestamps are compared as `unix_micros` longs end-to-end — integer
  *     arithmetic is engine-portable (the DuckDB oracle replays it exactly)
  *     and avoids timezone/rounding semantics entirely.
  */
object EventOps {

  /** Gap-based sessionization: consecutive events of one entity belong to
    * the same session iff the gap to the previous event is ≤ `gapMicros`.
    * Classic two-pass window formulation: mark session starts with `lag`,
    * then a running `sum` assigns 1-based session ids; both windows share
    * one partitioning, so Catalyst plans a single Exchange followed by two
    * in-partition Window passes and a partial-agg rollup.
    *
    * Output: (user, session_id, n_events, start_us, end_us) — one row per
    * session. Deterministic under ties via the `(ts, id)` sort key.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String, idCol: String,
                 gapMicros: Long): DataFrame = {
    val tsUs: Column = unix_micros(col(tsCol).cast("timestamp"))
    val w = Window.partitionBy(col(userCol)).orderBy(col("ts_us"), col(idCol))
    val prev = lag(col("ts_us"), 1).over(w)
    events
      .select(col(userCol), col(idCol), tsUs.as("ts_us"))
      // two staged projections (windows cannot nest); both share w's
      // partitioning and sort, so Catalyst plans ONE Exchange + sort
      .withColumn("is_new", when(prev.isNull || col("ts_us") - prev > gapMicros, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
  }

  /** Latest event per entity as of a cutoff — the as-of pick. Implemented
    * as `max(struct(ts, id, payload...))` under a plain hash aggregate:
    * struct ordering is lexicographic, so `(ts_us, id)` is the sort key
    * and the payload rides along. This is deliberately NOT a window
    * `row_number = 1`: the aggregate gets a map-side partial (each input
    * partition reduces to ≤ |users| rows before the shuffle), whereas the
    * window formulation must shuffle and sort every event.
    *
    * `payloadCols` are carried on the winning row; the id tie-break makes
    * the pick deterministic even under equal timestamps.
    */
  def latestAsOf(events: DataFrame, userCol: String, tsCol: String, idCol: String,
                 cutoffMicros: Long, payloadCols: Seq[String]): DataFrame = {
    val tsUs: Column = unix_micros(col(tsCol).cast("timestamp"))
    val fields = tsUs.as("ts_us") +: col(idCol) +: payloadCols.map(col)
    events
      .filter(tsUs <= cutoffMicros)
      .groupBy(col(userCol))
      .agg(max(struct(fields: _*)).as("m"))
      .select(col(userCol) +: ("ts_us" +: idCol +: payloadCols).map(f => col(s"m.$f")): _*)
  }
}
