package graft

import graft.events.EventOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def events(rows: Seq[(Long, String, Long, String)]) = {
    import spark.implicits._
    rows.toDF("user_id", "ts_str", "event_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_str"))).drop("ts_str")
  }

  test("sessionize: splits strictly above the gap, holds at exactly the gap") {
    // gap = 60s. deltas: 60s (hold), 61s (split), 1s (hold)
    val e = events(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (1L, "2024-01-01 00:01:00", 2L, "view"),   // +60s  -> same session
      (1L, "2024-01-01 00:02:01", 3L, "view"),   // +61s  -> new session
      (1L, "2024-01-01 00:02:02", 4L, "view"),   // +1s   -> same
      (2L, "2024-01-01 00:00:00", 5L, "view")))  // other user independent
    val got = EventOps.sessionize(e, "user_id", "ts", "event_id", 60L * 1000000)
      .orderBy("user_id", "session_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 2L), (1L, 2L, 2L), (2L, 1L, 1L)))
  }

  test("sessionize: every event lands in exactly one session; bounds are real event times") {
    import spark.implicits._
    // each 3-event burst (10s apart) belongs to ONE user — (i/3) % 7, not
    // i % 7, which would interleave users so every per-user gap exceeded
    // the session gap and every session degenerated to a singleton,
    // making the burst-span assertions vacuous; a user's bursts are 7h
    // apart, far beyond the 30 min gap
    val e = (0L until 200L).map { i =>
      val off = (i / 3) * 3600 + (i % 3) * 10
      ((i / 3) % 7, 1704067200L + off, i, "view")
    }.toDF("user_id", "epoch_s", "event_id", "event_type")
      .withColumn("ts", timestamp_seconds(col("epoch_s"))).drop("epoch_s")
    val sess = EventOps.sessionize(e, "user_id", "ts", "event_id", 1800L * 1000000)
    val total = sess.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == 200L, "every event in exactly one session")
    assert(sess.filter(col("end_us") < col("start_us")).count() == 0)
    // sessions really merge: every full burst is one 3-event session
    assert(sess.filter(col("n_events") === 3).count() == 66,
      "66 full bursts must each collapse into one 3-event session")
    // no session spans a gap: a 3-event 10s burst spans exactly 20s
    assert(sess.filter(col("n_events") === 3 &&
      col("end_us") - col("start_us") =!= 20L * 1000000).count() == 0)
    assert(sess.filter(col("end_us") - col("start_us") > 20L * 1000000).count() == 0)
  }

  test("asofJoin: latest right at-or-before each left; inclusive at equal ts; no-match keeps NULL; per-key isolation") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L), // after r@50 and r@100 → inclusive pick r@100
      (1L, 99L, 11L),  // between r@50 and r@100 → r@50
      (1L, 10L, 12L),  // before any right row → NULL
      (2L, 500L, 13L), // other key: only key-2 rights visible
      (3L, 500L, 14L)  // key with no right rows at all → NULL
    ).toDF("user_id", "ts_us", "event_id")
    val right = Seq(
      (1L, 50L, 20L), (1L, 100L, 21L), (1L, 200L, 22L), // 200 is in the future of all lefts
      (2L, 400L, 23L)
    ).toDF("user_id", "ts_us", "view_id")
      .withColumn("view_ts_us", col("ts_us"))
    val got = EventOps.asofJoin(left, right, "user_id", "ts_us", Seq("view_id", "view_ts_us"))
      .collect().map(r => (r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got == Map(10L -> 21L, 11L -> 20L, 12L -> -1L, 13L -> 23L, 14L -> -1L),
      s"got $got")
  }

  test("asofJoin: brute-force parity on a randomized fixture; duplicate right timestamps pick deterministically") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val left = (1 to 200).map(i => ((i % 7).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "ts_us", "lid")
    val right = (1 to 150).map(i => ((i % 7).toLong, rnd.nextInt(1000).toLong, (1000 + i).toLong))
      .toDF("k", "ts_us", "rid")
      .withColumn("r_ts", col("ts_us"))
    val got = EventOps.asofJoin(left, right, "k", "ts_us", Seq("rid", "r_ts"))
      .collect().map(r => (r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    // brute force: max (ts, rid) among rights with same key and ts <= left ts
    val rRows = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lRows = left.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    lRows.foreach { case (k, ts, lid) =>
      val cand = rRows.filter(r => r._1 == k && r._2 <= ts)
      val want = if (cand.isEmpty) -1L
      // window orders by (ts, side, payload struct) — among equal right
      // ts the LARGEST (rid, r_ts) struct is carried forward last
      else cand.maxBy(r => (r._2, r._3))._3
      assert(got(lid) == want, s"left $lid (k=$k, ts=$ts): got ${got(lid)}, want $want")
    }
  }

  test("latestAsOf: brute-force parity and cutoff respected") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val rows = (0L until 500L).map { i =>
      val sec = rng.nextInt(100000)
      (i % 23, f"2024-01-0${1 + sec / 86400}%d ${sec / 3600 % 24}%02d:${sec / 60 % 60}%02d:${sec % 60}%02d", i, s"t${i % 3}")
    }
    val e = events(rows)
    val cutoff = 1704100000000000L // 2024-01-01T09:06:40Z
    val got = EventOps.latestAsOf(e, "user_id", "ts", "event_id", cutoff, Seq("event_type"))
    // brute force via window rank
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy(desc("ts_us"), desc("event_id"))
    val exp = e.withColumn("ts_us", unix_micros($"ts".cast("timestamp")))
      .filter($"ts_us" <= cutoff)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"ts_us", $"event_id", $"event_type")
    assert(got.count() == exp.count())
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
    assert(got.filter($"ts_us" > cutoff).count() == 0)
  }

  test("rangeJoin: inclusive endpoints, exact overlap set, multi-bucket pairs survive exactly once") {
    import spark.implicits._
    val left = Seq(
      (1L, 0L, 100L),   // overlaps r10 and touches r20 at exactly 100
      (2L, 200L, 250L), // strictly inside r20
      (3L, 400L, 500L), // overlaps nothing
      (4L, 0L, 1000L)   // spans many 64-wide buckets; overlaps all three
    ).toDF("lid", "ls", "le")
    val right = Seq(
      (10L, 50L, 150L), (20L, 100L, 300L), (30L, 600L, 700L)
    ).toDF("rid", "rs", "re")
    val got = EventOps.rangeJoin(left, right, "ls", "le", "rs", "re", bucketUs = 64L)
      .select($"lid", $"rid").as[(Long, Long)].collect()
    val want = Set((1L, 10L), (1L, 20L), (2L, 20L), (4L, 10L), (4L, 20L), (4L, 30L))
    assert(got.toSet == want, s"got ${got.toSet}")
    // row count equals the pair-set size: pairs sharing several buckets
    // are emitted only at their canonical bucket, never duplicated
    assert(got.length == want.size)
  }

  test("rangeJoin: brute-force parity on randomized intervals across bucket widths") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val lRows = (1 to 200).map { i =>
      val s = rnd.nextInt(5000).toLong; (i.toLong, s, s + rnd.nextInt(300))
    }
    val rRows = (1 to 100).map { i =>
      val s = rnd.nextInt(5000).toLong; (i.toLong, s, s + rnd.nextInt(500))
    }
    val want = (for {
      (lid, ls, le) <- lRows; (rid, rs, re) <- rRows
      if ls <= re && rs <= le
    } yield (lid, rid)).toSet
    val left = lRows.toDF("lid", "ls", "le")
    val right = rRows.toDF("rid", "rs", "re")
    // widths below, near, and far above the median span — fan-out and
    // canonical-bucket dedup must be invariant to the tuning knob
    for (bucket <- Seq(7L, 256L, 100000L)) {
      val got = EventOps.rangeJoin(left, right, "ls", "le", "rs", "re", bucket)
        .select($"lid", $"rid").as[(Long, Long)].collect()
      assert(got.toSet == want, s"bucket=$bucket: wrong pair set")
      assert(got.length == want.size, s"bucket=$bucket: duplicate pairs emitted")
    }
  }

  test("latestAsOf: equal timestamps break ties by id (deterministic)") {
    val e = events(Seq(
      (1L, "2024-01-01 00:00:00", 5L, "a"),
      (1L, "2024-01-01 00:00:00", 9L, "b"),
      (1L, "2024-01-01 00:00:00", 2L, "c")))
    val got = EventOps.latestAsOf(e, "user_id", "ts", "event_id", Long.MaxValue, Seq("event_type"))
      .collect()(0)
    assert(got.getLong(2) == 9L && got.getString(3) == "b")
  }

  test("funnel: order matters, greedy earliest walk, stalls keep nulls, step-0-less users absent") {
    val e = events(Seq(
      // user 1: full in-order walk; the pre-view click at 00:00 must NOT count
      (1L, "2024-01-01 00:00:00", 1L, "click"),
      (1L, "2024-01-01 01:00:00", 2L, "view"),
      (1L, "2024-01-01 02:00:00", 3L, "click"),
      (1L, "2024-01-01 03:00:00", 4L, "purchase"),
      // user 2: purchase BEFORE the click → walk stalls at depth 2
      (2L, "2024-01-01 01:00:00", 5L, "view"),
      (2L, "2024-01-01 01:30:00", 6L, "purchase"),
      (2L, "2024-01-01 02:00:00", 7L, "click"),
      // user 3: view only
      (3L, "2024-01-01 01:00:00", 8L, "view"),
      // user 4: never views → absent from the funnel entirely
      (4L, "2024-01-01 01:00:00", 9L, "purchase")))
    val got = EventOps.funnel(e, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0),
        Option(r.getTimestamp(1)).map(_.toString).orNull,
        Option(r.getTimestamp(2)).map(_.toString).orNull,
        Option(r.getTimestamp(3)).map(_.toString).orNull,
        r.getLong(4))).sortBy(_._1)
    assert(got.length == 3)
    assert(got(0) == ((1L, "2024-01-01 01:00:00.0", "2024-01-01 02:00:00.0",
      "2024-01-01 03:00:00.0", 3L)))
    assert(got(1) == ((2L, "2024-01-01 01:00:00.0", "2024-01-01 02:00:00.0", null, 2L)))
    assert(got(2) == ((3L, "2024-01-01 01:00:00.0", null, null, 1L)))
    // equal timestamps count (>= semantics): view and click at the same instant
    val tie = events(Seq(
      (5L, "2024-01-01 01:00:00", 10L, "view"),
      (5L, "2024-01-01 01:00:00", 11L, "click")))
    val t = EventOps.funnel(tie, "user_id", "event_type", "ts", Seq("view", "click"))
      .collect()(0)
    assert(t.getLong(3) == 2L)
  }

  test("transitions: consecutive pairs per user in (ts, id) order; no cross-user pairs") {
    val e = events(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (1L, "2024-01-01 00:00:10", 2L, "click"),
      (1L, "2024-01-01 00:00:20", 3L, "view"),
      (2L, "2024-01-01 00:00:05", 4L, "purchase"), // isolated single event
      (3L, "2024-01-01 00:00:00", 5L, "view"),
      (3L, "2024-01-01 00:00:00", 6L, "click")))   // tie → id order
    val got = EventOps.transitions(e, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      ("view", "click") -> 2L,   // user 1 and user 3 (tie broken by id)
      ("click", "view") -> 1L))
  }

  test("retention: cohorts by first-seen day, offsets dedup within day, ppm exact") {
    // user 1: days 0, 0, 2  (cohort 0 — day-0 twice must count once)
    // user 2: days 0, 1     (cohort 0)
    // user 3: days 2, 2     (cohort 2 — its own cohort, not day-0's)
    val day = 86400L
    val e = events(Seq(
      (1L, "2024-01-01 05:00:00", 1L, "view"),
      (1L, "2024-01-01 09:00:00", 2L, "view"),
      (1L, "2024-01-03 05:00:00", 3L, "view"),
      (2L, "2024-01-01 23:00:00", 4L, "view"),
      (2L, "2024-01-02 01:00:00", 5L, "view"),
      (3L, "2024-01-03 12:00:00", 6L, "view"),
      (3L, "2024-01-03 13:00:00", 7L, "view")))
    val got = EventOps.retention(e, "user_id", "ts", day * 1000000)
      .orderBy("cohort_p", "offset_p")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val d0 = 19723L // 2024-01-01 in days since epoch
    assert(got == Seq(
      (d0, 0L, 2L, 2L, 1000000L),      // cohort day0: users 1,2 active at offset 0
      (d0, 1L, 1L, 2L, 500000L),       // user 2 on day 1 → 50%
      (d0, 2L, 1L, 2L, 500000L),       // user 1 on day 2 (deduped within day 0)
      (d0 + 2, 0L, 1L, 1L, 1000000L))) // user 3 is its OWN cohort
  }

  test("retention: every cohort has an offset-0 row equal to its size; actives never exceed it") {
    import spark.implicits._
    val e = (0L until 300L).map { i =>
      (i % 23, 1704067200L + (i % 11) * 86400 + i * 37, i, "view")
    }.toDF("user_id", "epoch_s", "event_id", "event_type")
      .withColumn("ts", timestamp_seconds(col("epoch_s"))).drop("epoch_s")
    val r = EventOps.retention(e, "user_id", "ts", 86400L * 1000000)
    assert(r.filter(col("offset_p") === 0 && col("n_active") =!= col("cohort_size"))
      .count() == 0)
    assert(r.filter(col("n_active") > col("cohort_size")).count() == 0)
    assert(r.filter(col("retention_ppm") > 1000000L).count() == 0)
    // distinct users across offset-0 rows == distinct users in the input
    val sizes = r.filter(col("offset_p") === 0).agg(sum("cohort_size"))
      .collect()(0).getLong(0)
    assert(sizes == 23L)
  }
}
