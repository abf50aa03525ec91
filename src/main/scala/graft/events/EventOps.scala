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

  /** As-of JOIN: for every left row, attach the right row with the same
    * key and the greatest `tsCol` ≤ the left row's (inclusive — the
    * DuckDB/kdb `ASOF JOIN` convention); left rows with no earlier right
    * row keep NULL payloads (left-outer). The temporal join a crawl
    * pipeline runs constantly: "which robots snapshot / site config /
    * model version governed this fetch".
    *
    * Spark has no native as-of join, and the naive formulation —
    * `l JOIN r ON l.k = r.k AND r.ts <= l.ts` + max-rank — explodes to
    * every (left, earlier-right) pair before pruning (quadratic per hot
    * key, BNLJ if the planner can't use the equi-key). This is instead
    * the UNION + window formulation: tag both inputs, shuffle ONCE on the
    * key, sort in-partition by `(ts, side, payload)` (right rows sort
    * before left at equal ts ⇒ inclusive semantics; the payload struct is
    * a total tie-break, so the pick is deterministic even with duplicate
    * right timestamps), and carry the latest right payload forward with
    * `last(ignoreNulls)`. Cost = one Exchange + one sort over |L|+|R|
    * rows — the same shape as [[sessionize]], and what a 10^12-row as-of
    * must plan. AQE handles hot keys; payload structs ride the single
    * shuffle once.
    *
    * `rightPayload` names the right columns to attach (they must not
    * collide with left column names — rename on the way in).
    */
  /** Interval-overlap (range) JOIN: every (left, right) pair whose closed
    * intervals `[lStart, lEnd]` and `[rStart, rEnd]` overlap — the temporal
    * join a crawl pipeline runs against maintenance windows, robots-change
    * windows, or incident spans ("which fetch sessions were exposed to
    * outage W"). Spark has no native interval join; the naive formulation
    * `l JOIN r ON l.s <= r.e AND r.s <= l.e` has no equi-key, so the
    * planner falls back to BroadcastNestedLoopJoin / CartesianProduct —
    * quadratic, and a non-starter at 10^12 rows.
    *
    * This is the bucketed formulation: each interval explodes into the
    * fixed-width time buckets it covers, the join runs as a plain
    * EQUI-join on the bucket id, and the exact overlap predicate filters
    * the bucket-collisions. A pair overlapping across k shared buckets
    * would match k times; instead of a `distinct` (a second shuffle over
    * the matched pairs), each pair is kept only at its CANONICAL bucket —
    * the bucket of `greatest(lStart, rStart)`, which for an overlapping
    * pair lies in both intervals' bucket ranges — so every overlapping
    * pair survives exactly once and the plan stays one equi-join with no
    * dedup stage.
    *
    * Scale notes: shuffle keys are bucket ids (one long); fan-out per row
    * is `ceil(span / bucketUs) + 1`, so `bucketUs` should be chosen near
    * the median interval span (fan-out ~2). Hot buckets (everyone overlaps
    * rush hour) are AQE-splittable since the join is a plain equi-join.
    * Timestamps must be non-negative (integer `DIV` truncates toward zero,
    * which is floor only for non-negatives — same precondition as the
    * sampler's hash buckets).
    */
  def rangeJoin(left: DataFrame, right: DataFrame,
                lStart: String, lEnd: String, rStart: String, rEnd: String,
                bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val collisions = left.columns.toSet.intersect(right.columns.toSet)
    require(collisions.isEmpty, s"left/right column names collide: $collisions")
    val lb = left.withColumn("_bucket",
      explode(sequence(expr(s"$lStart DIV ${bucketUs}L"), expr(s"$lEnd DIV ${bucketUs}L"))))
    val rb = right.withColumn("_bucket",
      explode(sequence(expr(s"$rStart DIV ${bucketUs}L"), expr(s"$rEnd DIV ${bucketUs}L"))))
    lb.join(rb, Seq("_bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("_bucket") === expr(s"greatest($lStart, $rStart) DIV ${bucketUs}L"))
      .drop("_bucket")
  }

  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
               rightPayload: Seq[String]): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name at least one column")
    val collisions = rightPayload.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty, s"rightPayload collides with left columns: $collisions")
    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(rightPayload.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType
    val lTagged = left.select(col(keyCol).as("_k"), col(tsCol).as("_ts"),
      lit(1).as("_side"), lit(null).cast(rType).as("_r"), lStruct.as("_l"))
    val rTagged = right.select(col(keyCol).as("_k"), col(tsCol).as("_ts"),
      lit(0).as("_side"), rStruct.as("_r"), lit(null).cast(lType).as("_l"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"), col("_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rTagged.unionByName(lTagged)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.map(c => col(s"_l.$c").as(c)) ++
        rightPayload.map(c => col(s"_m.$c").as(c)): _*)
  }

  /** Funnel analysis — the ordered-sequence completion question every
    * event pipeline answers (view → click → purchase): per entity, the
    * EARLIEST in-order walk of the step sequence, where step k counts
    * only at-or-after the entity's step-(k−1) timestamp. One row per
    * entity that reached step 0, with each reached step's timestamp
    * (null once the walk stalls) and the depth reached. Greedy
    * earliest-first is the standard semantics (and optimal here: taking
    * the earliest valid step-k timestamp can only enlarge the candidate
    * set for step k+1, so greedy reaches the maximum depth).
    *
    * Scale shape: per step, a filtered slim (user, ts) aggregate joined
    * on the SAME user key — Spark reuses the hash partitioning across
    * the chain, so the events table shuffles once per step at slim width
    * and the accumulating per-user relation never re-exchanges. No
    * windows, no per-user arrays — a state-machine window would sort
    * every user's full history; the agg-join chain touches only the
    * step-typed rows. Steps are few by nature (3–6); depth of the chain
    * is the step count, not data-dependent.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
             steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, s"a funnel needs at least 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size, s"duplicate steps: $steps")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("ts_0"))
    val full = steps.zipWithIndex.tail.foldLeft(first) { case (acc, (st, i)) =>
      val nxt = events.filter(col(typeCol) === st)
        .select(col(userCol), col(tsCol).as("_ev_ts"))
        .join(acc.select(col(userCol), col(s"ts_${i - 1}")), Seq(userCol))
        .where(col("_ev_ts") >= col(s"ts_${i - 1}"))
        .groupBy(col(userCol)).agg(min(col("_ev_ts")).as(s"ts_$i"))
      acc.join(nxt, Seq(userCol), "left")
    }
    val depth = steps.indices
      .map(i => when(col(s"ts_$i").isNotNull, 1L).otherwise(0L)).reduce(_ + _)
    full.select(
      col(userCol) +: steps.indices.map(i => col(s"ts_$i").as(s"ts_${steps(i)}")) :+
        depth.as("depth"): _*)
  }

  /** Event-type transition counts — the order-1 Markov matrix over each
    * entity's event sequence (`view→click`, `click→purchase`, …): the
    * clickstream structure summary funnels sample one path of. One row
    * per (from_type, to_type) with the corpus-wide transition count;
    * consecutive-pair semantics under the deterministic `(ts, id)`
    * order.
    *
    * Scale shape: ONE entity-key exchange feeds the `lead` window (same
    * partitioning discipline as [[sessionize]]); the transition rollup
    * then aggregates slim (from, to) pairs with map-side partials —
    * event-type alphabets are tiny, so the final relation is
    * metadata-sized.
    */
  def transitions(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col("ts_us"), col(idCol))
    events
      .select(col(userCol), col(idCol), col(typeCol),
        unix_micros(col(tsCol).cast("timestamp")).as("ts_us"))
      .withColumn("_next", lead(col(typeCol), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Cohort retention — the "does the crawl keep seeing this host/user"
    * matrix every longitudinal corpus asks for: entities are grouped into
    * cohorts by their FIRST-seen period (`ts_us DIV periodMicros`, an
    * integer period index — days for 86400e6), and each later period an
    * entity is active contributes to that cohort's retention at offset
    * `period − cohort`. Output: one row per (cohort, offset) with
    * `n_active` (distinct entities), `cohort_size` (the offset-0 count —
    * every entity is active in its first period by construction) and
    * `retention_ppm = n_active · 10^6 DIV cohort_size` (integer,
    * engine-portable).
    *
    * Scale shape (10^12 events): ONE exchange on the entity key; the
    * first-seen period is a window `min` over that partitioning, and the
    * per-entity (cohort, offset) dedup groups by a superset of the
    * partition key, so it runs in-partition with no new exchange. Only
    * then do slim (cohort, offset) rows — bounded by periods², i.e.
    * metadata-sized — reach the final aggregate; the cohort-size
    * attachment is a window over that tiny relation. Events never carry
    * payload columns past the first projection.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String,
                periodMicros: Long): DataFrame = {
    require(periodMicros > 0, s"periodMicros must be positive, got $periodMicros")
    // integer DIV, never `/`: double division loses exactness past 2^53
    // and the oracle replays `//` (micros non-negative ⇒ DIV == floor)
    val period = expr(s"unix_micros(cast(`$tsCol` as timestamp)) DIV ${periodMicros}L")
    val w = Window.partitionBy(col(userCol))
    val perUser = events
      .select(col(userCol), period.as("p"))
      .withColumn("cohort", min(col("p")).over(w))
      .groupBy(col(userCol), col("cohort"), (col("p") - col("cohort")).as("offset_p"))
      .agg(count(lit(1)).as("_n")) // in-partition dedup: key ⊇ userCol
    val cells = perUser
      .groupBy(col("cohort").as("cohort_p"), col("offset_p"))
      .agg(count(lit(1)).as("n_active"))
    val wc = Window.partitionBy(col("cohort_p")).orderBy(col("offset_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cohort_size", first(col("n_active")).over(wc))
      .select(col("cohort_p"), col("offset_p"), col("n_active"), col("cohort_size"),
        expr("n_active * 1000000 DIV cohort_size").as("retention_ppm"))
  }
}
