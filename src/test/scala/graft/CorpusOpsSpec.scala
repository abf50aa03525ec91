package graft

import graft.pipeline.Sharder
import graft.stats.CorpusStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("assignShards: total-weight balance bounded, all shards used, deterministic") {
    import spark.implicits._
    val rows = (0L until 4000L).map(i => (i, 10L + i % 200))
    val d = rows.toDF("doc_id", "w")
    val a = Sharder.assignShards(d, "doc_id", "w", numShards = 8, bucketWidth = 64, subGroups = 4)
    val stats = Sharder.shardStats(a, "w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(stats.map(_._1).sorted.toSeq == (0L until 8L), "all shards populated")
    assert(stats.map(_._2).sum == 4000L, "every doc assigned exactly once")
    val totals = stats.map(_._3)
    // amortizing regime (streams much longer than numShards): spread stays
    // within a tight relative band of the mean
    assert(totals.max <= totals.min * 1.10,
      s"shard totals too skewed: ${totals.mkString(",")}")
    val b = Sharder.assignShards(d, "doc_id", "w", 8, 64, 4)
    assert(a.exceptAll(b).isEmpty, "assignment is deterministic")
  }

  test("epochOrder: dense per-shard positions; same seed byte-identical; new seed a fresh permutation") {
    import spark.implicits._
    val d = (0L until 2000L).toDF("doc_id")
    val a = Sharder.epochOrder(d, "doc_id", seed = 7L, numShards = 8)
    val rows = a.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == 2000 && rows.map(_._1).distinct.length == 2000)
    // positions are dense 0..n-1 within every shard
    rows.groupBy(_._2).foreach { case (sh, g) =>
      assert(g.map(_._3).sorted.toSeq == (0L until g.length), s"shard $sh positions not dense")
    }
    // reproducible: a restart sees the identical order
    val a2 = Sharder.epochOrder(d, "doc_id", 7L, 8)
    assert(a.exceptAll(a2).isEmpty, "same seed must be byte-identical")
    // a new epoch (seed) is a genuinely different permutation: most docs
    // change (shard, pos); order within any shard decorrelates from ids
    val b = Sharder.epochOrder(d, "doc_id", 8L, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val moved = rows.toSet.diff(b.toSet).size
    assert(moved > 1500, s"seed change moved only $moved/2000 rows")
    val idOrderedShard = rows.filter(_._2 == 0L).sortBy(_._3).map(_._1)
    assert(idOrderedShard.toSeq != idOrderedShard.sorted.toSeq,
      "within-shard order must not be id order")
  }

  test("curriculumOrder: positions dense within (tier, shard); tiers never move with the seed; within-tier order matches epochOrder") {
    import spark.implicits._
    val d = (0L until 1200L).map(i => (i, i % 3)).toDF("doc_id", "tier")
    val a = Sharder.curriculumOrder(d, "doc_id", "tier", seed = 7L, numShards = 4)
    val rows = a.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 1200)
    rows.groupBy(r => (r._2, r._3)).foreach { case (k, g) =>
      assert(g.map(_._4).sorted.toSeq == (0L until g.length), s"positions not dense in $k")
    }
    // a new seed reshuffles but every doc keeps its tier
    val b = Sharder.curriculumOrder(d, "doc_id", "tier", seed = 9L, numShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(r => r._1 -> r._2).toMap == b.map(r => r._1 -> r._2).toMap,
      "seed must never move a document across tiers")
    assert(rows.toSet != b.toSet, "seed must reshuffle within tiers")
    // within one tier the schedule IS the epoch permutation of that slice
    val slice = d.filter(col("tier") === 1).select("doc_id")
    val epoch = Sharder.epochOrder(slice, "doc_id", 7L, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val tier1 = rows.filter(_._2 == 1L).map(r => (r._1, r._3, r._4)).toSet
    assert(tier1 == epoch, "per-tier schedule must equal epochOrder on the tier slice")
  }

  test("assignShards: rare giant documents honor the additive balance bound") {
    import spark.implicits._
    // a handful of 5000-weight giants over a small-doc corpus: the giant
    // bucket's streams are SHORT, so only the additive bound holds —
    // spread <= max giant weight + numBuckets*subGroups*bucketWidth
    val rows = (0L until 4000L).map(i => (i, if (i % 997 == 0) 5000L else 10L + i % 200))
    val d = rows.toDF("doc_id", "w")
    val a = Sharder.assignShards(d, "doc_id", "w", numShards = 8, bucketWidth = 64, subGroups = 4)
    val totals = Sharder.shardStats(a, "w").collect().map(_.getLong(2))
    // giants rarer than shards place balls-into-bins over hashed phases
    // (see Sharder scaladoc): 5 giants over 8 shards can double up once,
    // so the bound is TWO giant quanta + the statistical small-doc spread
    assert(totals.max - totals.min <= 2 * 5000L + 2000L,
      s"giant regime spread exceeded the bound: ${totals.mkString(",")}")
    // the per-stream phase offset spreads stream heads: the giants must
    // not all land on one shard
    val giantShards = a.filter(col("w") === 5000L).select("shard").as[Long].collect().toSet
    assert(giantShards.size >= 3, s"giants piled onto shards $giantShards")
  }

  test("assignShards: within one (bucket,sub) stream, shards cycle round-robin in hash order") {
    import spark.implicits._
    val d = (0L until 64L).map(i => (i * 4, 100L)).toDF("doc_id", "w") // one bucket, sub=0
    val got = Sharder.assignShards(d, "doc_id", "w", numShards = 8, bucketWidth = 64, subGroups = 4)
      .orderBy(md5($"doc_id".cast("string"))).select("shard").as[Long].collect().toSeq
    // bucket = 100/64 = 1 -> stream phase (1*31 + 0) % 8 = 7
    assert(got == (0L until 64L).map(i => (i + 7) % 8))
  }

  test("packSequences: every doc assigned once; non-last bins filled within one doc of capacity") {
    import spark.implicits._
    val cap = 100L
    val rows = (0L until 3000L).map(i => (i, 1L + (i * 7) % 40)) // weights 1..40
    val maxW = rows.map(_._2).max
    val d = rows.toDF("doc_id", "w")
    val p = graft.pipeline.SeqPacker.packSequences(d, "doc_id", "w", cap, streams = 4)
    assert(p.count() == 3000L, "every doc assigned exactly once")
    assert(p.filter(col("seq_offset") >= cap || col("seq_offset") < 0).count() == 0)
    val stats = graft.pipeline.SeqPacker.sequenceStats(p, "w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val lastSeq = stats.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    stats.foreach { case (stream, seq, total) =>
      assert(total <= cap + maxW - 1, s"bin ($stream,$seq) overflows beyond one doc: $total")
      if (seq != lastSeq(stream))
        assert(total >= cap - maxW + 1, s"non-last bin ($stream,$seq) underfilled: $total")
    }
  }

  test("packSequences: deterministic across parallelism; giant doc owns its bin span") {
    import spark.implicits._
    val d = (0L until 500L).map(i => (i, if (i == 250L) 900L else 10L)).toDF("doc_id", "w")
    val a = graft.pipeline.SeqPacker.packSequences(d.repartition(1), "doc_id", "w", 100L, 4)
    val b = graft.pipeline.SeqPacker.packSequences(d.repartition(16), "doc_id", "w", 100L, 4)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, "bit-identical at any parallelism")
    // the 900-weight giant spans 9 capacity units: no other doc shares a
    // seq_no strictly inside its span
    val g = a.filter($"doc_id" === 250L).select($"stream", $"seq_no", $"seq_offset")
      .as[(Long, Long, Long)].head()
    val inside = a.filter($"stream" === g._1 && $"doc_id" =!= 250L &&
      $"seq_no" > g._2 && $"seq_no" < g._2 + (g._3 + 900L) / 100L).count()
    assert(inside == 0, "bins covered by the giant's span stay empty")
  }

  test("sliceBlocks: exact block coverage — contiguous spans, boundary splits, zero-weight docs") {
    import spark.implicits._
    val d = (0L until 400L).map(i =>
      (i, if (i % 50 == 0) 0L else 1L + (i * 11) % 90)).toDF("doc_id", "w")
    val cap = 64L
    val p = graft.pipeline.SeqPacker.sliceBlocks(d, "doc_id", "w", cap, streams = 4)
      .select($"doc_id", $"w", $"stream", $"start_off", $"block_first", $"block_last", $"n_blocks")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    p.foreach { case (id, w, _, start, bf, bl, nb) =>
      if (w == 0L) assert(nb == 0L, s"doc $id zero-weight must occupy no block")
      else {
        assert(bf == start / cap && bl == (start + w - 1) / cap, s"doc $id block ids")
        assert(nb == bl - bf + 1, s"doc $id n_blocks")
      }
    }
    // within a stream: token spans are contiguous (zero padding) — each
    // doc's start is exactly the previous doc's start + weight
    p.groupBy(_._3).foreach { case (_, rows) =>
      val byStart = rows.sortBy(_._4)
      byStart.sliding(2).foreach {
        case Array(a, b) => assert(b._4 == a._4 + a._2, s"gap between ${a._1} and ${b._1}")
        case _ =>
      }
      assert(byStart.head._4 == 0L, "stream token space starts at 0")
    }
    // determinism across parallelism
    val q = graft.pipeline.SeqPacker.sliceBlocks(d.repartition(16), "doc_id", "w", cap, 4)
    assert(graft.pipeline.SeqPacker.sliceBlocks(d.repartition(1), "doc_id", "w", cap, 4)
      .exceptAll(q).isEmpty)
  }

  test("upsampled (duplicate-id) input packs and shards deterministically via the copy tiebreak") {
    import spark.implicits._
    // two copies of every doc — the shape upsampleByEpochs emits; md5(id)
    // alone leaves copies TIED in the window order, making the prefix sum
    // and row_number order-dependent
    val d = (0L until 300L).flatMap(i => Seq((i, 0L, 10L + i % 7), (i, 1L, 10L + i % 7)))
      .toDF("doc_id", "copy", "w")
    val pa = graft.pipeline.SeqPacker.packSequences(d.repartition(1), "doc_id", "w", 100L, 4)
    val pb = graft.pipeline.SeqPacker.packSequences(d.repartition(16), "doc_id", "w", 100L, 4)
    assert(pa.exceptAll(pb).isEmpty && pb.exceptAll(pa).isEmpty,
      "packing of duplicate ids must be bit-identical at any parallelism")
    // every (doc_id, copy) keeps exactly one (seq_no, seq_offset)
    assert(pa.groupBy($"doc_id", $"copy").count().filter($"count" > 1).count() == 0)
    val sa = Sharder.assignShards(d.repartition(1), "doc_id", "w", 8, 64, 4)
    val sb = Sharder.assignShards(d.repartition(16), "doc_id", "w", 8, 64, 4)
    assert(sa.exceptAll(sb).isEmpty && sb.exceptAll(sa).isEmpty,
      "sharding of duplicate ids must be bit-identical at any parallelism")
  }

  test("bpePairStats: frequency-weighted adjacent pairs; single-char tokens contribute nothing; ties by pair") {
    import spark.implicits._
    // "ab" ×3 (two docs), "abc" ×1, "x" ×2 (no pairs), "12" digits count too
    val d = Seq(
      (1L, "ab ab x 12"),
      (2L, "ab abc x")
    ).toDF("doc_id", "text")
    val out = CorpusStats.bpePairStats(d, "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // pairs: "ab" from "ab"×3 and "abc"×1 → 4; "bc" from "abc" → 1; "12" → 1
    assert(out.toSeq == Seq(("ab", 4L), ("12", 1L), ("bc", 1L)),
      s"expected frequency-weighted pairs in (n DESC, pair) order, got ${out.toSeq}")
    // topK truncates deterministically
    val top1 = CorpusStats.bpePairStats(d, "text", topK = 1).collect()
    assert(top1.length == 1 && top1(0).getString(0) == "ab")
  }

  test("corpusCard: exact one-row profile; blank text counts zero tokens; dup rate via distinct fingerprints") {
    import spark.implicits._
    val d = Seq(
      (1L, "hello world", "en", "web"),
      (2L, "  HELLO   world ", "en", "web"), // normalizes to doc 1's text → same fingerprint
      (3L, "", "pt", "pdf"),
      (4L, "three token line", "en", "web")
    ).toDF("doc_id", "text", "lang", "source")
    val r = CorpusStats.corpusCard(d, "text", "lang", "source").collect()(0)
    assert(r.getLong(r.fieldIndex("n_docs")) == 4L)
    assert(r.getLong(r.fieldIndex("n_tokens")) == 2L + 2L + 0L + 3L)
    assert(r.getLong(r.fieldIndex("n_chars")) == 11L + 16L + 0L + 16L)
    assert(r.getLong(r.fieldIndex("n_langs")) == 2L)
    assert(r.getLong(r.fieldIndex("n_sources")) == 2L)
    assert(r.getLong(r.fieldIndex("n_distinct_texts")) == 3L,
      "docs 1 and 2 share a normalized fingerprint")
  }

  test("quartilesX4: interpolation parity with hand-computed quartiles") {
    import spark.implicits._
    // odd count: 1..5 -> q25=2, q50=3, q75=4; even count: 1..4 -> 1.75, 2.5, 3.25
    val d = ((1 to 5).map(v => ("odd", v.toLong)) ++ (1 to 4).map(v => ("even", v.toLong)))
      .toDF("g", "v")
    val got = CorpusStats.quartilesX4(d, "g", "v").collect()
      .map(r => (r.getString(0), (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got("odd") == ((1L, 8L, 12L, 16L, 5L)))
    assert(got("even") == ((1L, 7L, 10L, 13L, 4L)))
  }

  private def hhRows(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] =
    df.select(explode(col("hh")).as("e"))
      .select(col("e.key"), col("e.count"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("heavyHitters exact regime: counts exact, err 0, partitioning-invariant, weights honored") {
    import spark.implicits._
    // 5 keys, weights: a=100, b=60, c=30, d=8, e=2 (via per-row weights)
    val rows = (0 until 50).map(i => ("a", 2L)) ++ (0 until 30).map(_ => ("b", 2L)) ++
      (0 until 30).map(_ => ("c", 1L)) ++ Seq(("d", 8L), ("e", 2L))
    val d = rows.toDF("k", "w")
    def run(parts: Int) = hhRows(graft.stats.CorpusStats.heavyHitters(
      d.repartition(parts), Seq.empty, "k", col("w"), k = 8))
    val got = run(1)
    assert(got == Seq(("a", 100L, 0L), ("b", 60L, 0L), ("c", 30L, 0L),
      ("d", 8L, 0L), ("e", 2L, 0L)), got.toString)
    assert(run(13) == got, "exact regime must be merge-order-invariant")
  }

  test("heavyHitters estimator regime: overestimate bound and no-false-dismissal hold under any merge order") {
    import spark.implicits._
    // zipf-ish: key i appears ~1200/i times, 60 distinct keys, k = 8
    val rows = (1 to 60).flatMap(i => Seq.fill(1200 / i)(s"key$i"))
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toLong
    for (parts <- Seq(1, 7)) {
      val got = hhRows(graft.stats.CorpusStats.heavyHitters(
        rows.toDF("k").repartition(parts), Seq.empty, "k", lit(1L), k = 8))
      assert(got.size == 8)
      got.foreach { case (key, cnt, err) =>
        val t = truth(key)
        assert(cnt >= t, s"$key: count $cnt under-estimates true $t (parts=$parts)")
        assert(cnt - err <= t, s"$key: guarantee count-err ≤ true broken (parts=$parts)")
      }
      // every key with true weight > n/k must be present
      val kept = got.map(_._1).toSet
      truth.filter(_._2 > n / 8).keys.foreach(hot =>
        assert(kept.contains(hot), s"heavy key $hot dismissed (parts=$parts)"))
    }
  }

  test("heavyHitters: per-group summaries; null keys skipped; SQL registration path") {
    import spark.implicits._
    val d = Seq(("g1", "x"), ("g1", "x"), ("g1", null), ("g2", "y"))
      .toDF("g", "k")
    val got = graft.stats.CorpusStats.heavyHitters(d, Seq("g"), "k", lit(1L), k = 4)
      .select(col("g"), explode(col("hh")).as("e"))
      .collect().map(r => (r.getString(0),
        r.getStruct(1).getString(0), r.getStruct(1).getLong(1))).toSet
    assert(got == Set(("g1", "x", 2L), ("g2", "y", 1L)))
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT graft_heavy_topk(k, CAST(1 AS BIGINT), 4) AS hh FROM VALUES ('a'), ('a'), ('b') t(k)")
    assert(hhRows(viaSql) == Seq(("a", 2L, 0L), ("b", 1L, 0L)))
  }

  test("corpusDigest: partitioning-invariant; flips on any changed row; counts distinct fps") {
    import spark.implicits._
    val d = (1L to 100L).map(i => (i, s"text body number ${i % 40}")).toDF("doc_id", "text")
    val a = CorpusStats.corpusDigest(d.repartition(1), "doc_id", "text").collect()(0)
    val b = CorpusStats.corpusDigest(d.repartition(8), "doc_id", "text").collect()(0)
    assert(a == b, "digest must be order/partitioning invariant")
    assert(a.getLong(0) == 100L && a.getLong(1) == 40L)
    val mutated = (1L to 100L).map(i =>
      (i, if (i == 57L) "changed!" else s"text body number ${i % 40}")).toDF("doc_id", "text")
    val c = CorpusStats.corpusDigest(mutated, "doc_id", "text").collect()(0)
    assert(c.getLong(2) != a.getLong(2), "one changed row must flip the digest")
    val dropped = d.filter(col("doc_id") =!= 57L)
    val e = CorpusStats.corpusDigest(dropped, "doc_id", "text").collect()(0)
    assert(e.getLong(2) != a.getLong(2) && e.getLong(0) == 99L)
  }

  test("concentration: hand-computed Gini via counts-of-counts; uniform → 0; skewed > 0") {
    import spark.implicits._
    // counts sorted [1,1,4]: sumic=15, gini = (30-24)/18 → 333333 ppm;
    // top share 4/6 → 666666 ppm
    val d = (Seq.fill(4)("A") ++ Seq("B", "C")).map(Tuple1(_)).toDF("domain")
    val r = CorpusStats.concentration(d, "domain").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 6L, 333333L, 666666L)), s"got $r")
    // uniform counts → gini exactly 0, top share = 1/n
    val u = Seq("A", "A", "B", "B", "C", "C").map(Tuple1(_)).toDF("domain")
    val ru = CorpusStats.concentration(u, "domain").collect()(0)
    assert(ru.getLong(2) == 0L && ru.getLong(3) == 333333L, s"got $ru")
    // single key: degenerate, gini 0, top share 10^6
    val s1 = Seq("A", "A", "A").map(Tuple1(_)).toDF("domain")
    val r1 = CorpusStats.concentration(s1, "domain").collect()(0)
    assert(r1.getLong(2) == 0L && r1.getLong(3) == 1000000L, s"got $r1")
    // determinism across parallelism
    val big = (1 to 500).map(i => Tuple1(s"d${i % 37}")).toDF("domain")
    val a1 = CorpusStats.concentration(big.repartition(1), "domain").collect()(0)
    val a8 = CorpusStats.concentration(big.repartition(8), "domain").collect()(0)
    assert(a1 == a8)
  }
}
