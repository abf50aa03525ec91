package graft

import graft.stats.CorpusStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the KMV distinct-sketch aggregate: exact-under-k regime,
  * estimator accuracy, partitioning invariance (which exercises the
  * map-side partial + merge path), SQL registration, and argument
  * validation. Value-exactness vs DuckDB is gated by the driver
  * (`q_kmv_distinct`).
  */
class KmvSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def values(n: Int, distinct: Int, groups: Int = 1) = {
    import spark.implicits._
    (0 until n).map(i => ((i % groups).toLong, s"v${i % distinct}"))
      .toDF("g", "v")
  }

  test("under k distinct values the sketch IS exact") {
    val got = CorpusStats.distinctSketch(values(200, distinct = 9), "g", "v", k = 16)
      .collect()(0)
    assert(got.getLong(2) == 9L, "exact countDistinct")
    assert(got.getLong(3) == 9L, "n_kept = all 9 hashes")
    assert(got.getLong(5) == 9L, "est = n_kept in the exact regime")
  }

  test("estimator lands near the truth past k, and is partitioning-invariant") {
    val d = values(20000, distinct = 5000)
    val est1 = CorpusStats.distinctSketch(d.repartition(1), "g", "v", k = 256)
      .collect()(0).getLong(5)
    val est13 = CorpusStats.distinctSketch(d.repartition(13, col("v")), "g", "v", k = 256)
      .collect()(0).getLong(5)
    assert(est1 == est13,
      "k-min set is order-independent: partial+merge must equal single-pass")
    // KMV relative error ~ 1/sqrt(k-1) ≈ 6% at k=256; allow 4 sigma
    assert(est1 > 3800 && est1 < 6200, s"estimate $est1 too far from 5000")
  }

  test("multiple groups aggregate independently") {
    val got = CorpusStats.distinctSketch(values(3000, distinct = 300, groups = 3), "g", "v", k = 64)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    // values v0..v299 round-robin over 3 groups → 100 distinct per group
    assert(got == Map(0L -> 100L, 1L -> 100L, 2L -> 100L))
  }

  test("null inputs are skipped; an all-null group yields an empty sketch, not an error") {
    import spark.implicits._
    val d = Seq((1L, "a"), (1L, null), (2L, null))
      .toDF("g", "v")
    val got = CorpusStats.distinctSketch(d, "g", "v", k = 4)
      .collect().map(r => (r.getLong(0), (r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(1L)._1 == 1L && got(1L)._2 > 0L && got(1L)._3 == 1L,
      s"one non-null value: n_kept 1, real kth_min, est 1 — got ${got(1L)}")
    assert(got(2L) == ((0L, 0L, 0L)),
      s"all-null group: empty sketch, kth_min 0, est 0 — got ${got(2L)}")
  }

  test("registered SQL surface works and validates its arguments") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq(1L, 2L, 3L, 2L).toDF("h").createOrReplaceTempView("kmv_in")
    val arr = spark.sql("SELECT graft_kmv_mink(h, 2) AS m FROM kmv_in")
      .collect()(0).getSeq[Long](0)
    assert(arr == Seq(1L, 2L), s"got $arr")
    val err = intercept[Exception] {
      spark.sql("SELECT graft_kmv_mink(h, 0) FROM kmv_in").collect()
    }
    assert(err.getMessage.contains("[1, 65536]") || err.getMessage.toLowerCase.contains("k must"),
      s"k=0 must be rejected loudly: ${err.getMessage}")
  }

  // ---- bottom-k quantile sketch ----

  test("quantile sketch: exact regime (group <= k) equals the exact quartiles bit for bit") {
    import spark.implicits._
    val d = (0L until 120L).map(i => (s"s${i % 3}", i, 10L + (i * 37) % 500))
      .toDF("source", "doc_id", "v") // 40 rows per group, k = 64 covers all
    val sketch = CorpusStats.quantileSketch(d, "source", "doc_id", "v", k = 64)
      .collect().map(r => r.getString(0) ->
        (r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val exact = CorpusStats.quartilesX4(d, "source", "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(sketch == exact, s"sketch $sketch vs exact $exact")
  }

  test("quantile sketch: estimator regime is partitioning-invariant and brackets the range") {
    import spark.implicits._
    val d = (0L until 10000L).map(i => ("g", i, (i * 13) % 1000)).toDF("source", "doc_id", "v")
    def run(parts: Int) = CorpusStats.quantileSketch(
        d.repartition(parts), "source", "doc_id", "v", k = 128)
      .collect()(0)
    val a = run(1); val b = run(17)
    assert(a.toSeq == b.toSeq, "bottom-k membership must be order-independent")
    assert(a.getLong(2) == 128L, "estimator regime: sample capped at k")
    // uniform values 0..999: sample medians ×4 should land mid-range
    assert(a.getLong(5) > 4 * 300 && a.getLong(5) < 4 * 700,
      s"median estimate ${a.getLong(5)} implausible for uniform 0..999")
    assert(a.getLong(3) >= 0L && a.getLong(7) <= 999L)
  }

  test("quantile sketch SQL surface validates its arguments") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1L, 5L)).toDF("h", "v").createOrReplaceTempView("bk_in")
    val got = spark.sql("SELECT graft_bottomk_sample(h, v, 4) FROM bk_in")
      .collect()(0).getSeq[Long](0)
    assert(got == Seq(5L))
    val err = intercept[Exception] {
      spark.sql("SELECT graft_bottomk_sample(h, v, 0) FROM bk_in").collect()
    }
    assert(err.getMessage.contains("[1, 65536]") || err.getMessage.toLowerCase.contains("k must"),
      s"k=0 must be rejected loudly: ${err.getMessage}")
  }
}
