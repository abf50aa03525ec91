package graft

import graft.sample.Sampler
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("bucket10k: engine-portable md5 buckets (values pinned against DuckDB)") {
    import spark.implicits._
    // ('0x' || substr(md5(id::varchar),1,8))::BIGINT % 10000 in DuckDB
    val got = Seq(0L, 1L, 2L).toDF("id")
      .select(Sampler.bucket10k(col("id"))).as[Int].collect().toSeq
    assert(got == Seq(6916, 9560, 8605))
  }

  test("sampleStratified: deterministic, rate-monotone, stratum-scoped") {
    import spark.implicits._
    val docs = (0L until 1000L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "s")
    def run(rateA: Int, rateB: Int) = {
      val rates = Seq(("a", rateA), ("b", rateB)).toDF("s", "rate_bp")
      Sampler.sampleStratified(docs, rates, "id", Seq("s")).select("id").as[Long].collect().toSet
    }
    val half = run(5000, 0)
    assert(half.forall(_ % 2 == 0), "rate 0 stratum must be empty")
    // uniformity (loose): ~50% of the 500 "a" docs survive at 5000 bp
    assert(half.size > 175 && half.size < 325)
    // determinism + monotonicity: raising the rate only adds documents
    assert(run(5000, 0) == half)
    assert(half.subsetOf(run(7000, 0)))
    assert(run(10000, 10000).size == 1000)
  }

  test("sampleToTokenBudget: per-sub-stream shares sum to budget; overshoot under one doc each") {
    import spark.implicits._
    val subStreams = 4
    val docs = (0L until 800L)
      .map(i => (i, if (i % 2 == 0) "a" else "b", 1L + (i * 13) % 29)) // weights 1..29
      .toDF("id", "s", "w")
    val budgets = Seq(("a", 1003L), ("b", 350L)).toDF("s", "budget")
    val kept = Sampler.sampleToTokenBudget(docs, budgets, "id", "s", "w", subStreams)
    assert(kept.columns.toSeq == Seq("s", "id", "w"), "helper columns dropped")
    val perSub = kept.groupBy($"s", Sampler.subStream($"id", subStreams).as("sub"))
      .agg(sum($"w").as("kw")).as[(String, Long, Long)].collect()
    val maxW = 29L
    perSub.foreach { case (s, sub, kw) =>
      val budget = if (s == "a") 1003L else 350L
      val share = budget / subStreams + (if (sub < budget % subStreams) 1L else 0L)
      assert(kw >= share && kw < share + maxW,
        s"($s,$sub) kept $kw outside [share, share+maxDoc) = [$share, ${share + maxW})")
    }
    // shares sum exactly to the budget -> stratum totals land in [budget, budget + 4*maxW)
    val byStratum = perSub.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(byStratum("a") >= 1003L && byStratum("a") < 1003L + 4 * maxW)
    assert(byStratum("b") >= 350L && byStratum("b") < 350L + 4 * maxW)
  }

  test("sampleToTokenBudget: deterministic across parallelism; zero budget keeps nothing; big budget keeps all") {
    import spark.implicits._
    val docs = (0L until 300L).map(i => (i, "a", 10L)).toDF("id", "s", "w")
    val z = Sampler.sampleToTokenBudget(docs, Seq(("a", 0L)).toDF("s", "budget"), "id", "s", "w", 4)
    assert(z.count() == 0)
    val all = Sampler.sampleToTokenBudget(docs, Seq(("a", 1000000L)).toDF("s", "budget"), "id", "s", "w", 4)
    assert(all.count() == 300)
    val budgets = Seq(("a", 777L)).toDF("s", "budget")
    val a = Sampler.sampleToTokenBudget(docs.repartition(1), budgets, "id", "s", "w", 4)
    val b = Sampler.sampleToTokenBudget(docs.repartition(16), budgets, "id", "s", "w", 4)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty, "bit-identical at any parallelism")
  }

  test("isqrt: exact floor(sqrt) including around perfect squares and float-rounding edges") {
    import spark.implicits._
    val probes = (0L to 2000L) ++
      Seq(225L, 224L, 226L, 1L << 40, (1L << 40) - 1, (1L << 40) + 1,
        // squares of values near 2^26 where sqrt(double) rounding can
        // land on the wrong integer side without the Newton fix
        (1L << 26) * (1L << 26), (1L << 26) * (1L << 26) - 1,
        ((1L << 26) + 3) * ((1L << 26) + 3) - 1,
        Long.MaxValue)
    val got = probes.toDF("n").select(col("n"), Sampler.isqrt(col("n")).as("s"))
      .as[(Long, Long)].collect()
    got.foreach { case (n, s) =>
      // floor(sqrt(n)) ⟺ s² ≤ n < (s+1)² — checked in BigInt so the
      // assertion itself cannot overflow at n = Long.MaxValue
      assert(s >= 0 && BigInt(s) * BigInt(s) <= BigInt(n), s"isqrt($n) = $s under")
      assert(BigInt(s + 1) * BigInt(s + 1) > BigInt(n), s"isqrt($n) = $s over")
    }
  }

  test("sampleTemperature: expected keeps ∝ √n, tail strata cap at keep-everything, deterministic") {
    import spark.implicits._
    // heavily skewed: 6400 / 400 / 25 docs → isqrt = 80 / 20 / 5
    val docs = ((0L until 6400L).map((_, "big")) ++
      (10000L until 10400L).map((_, "mid")) ++
      (20000L until 20025L).map((_, "small"))).toDF("id", "s")
    val out = Sampler.sampleTemperature(docs, "id", "s", targetBp = 5000)
    val rates = out.groupBy("s").agg(max("rate_bp").as("r"), count(lit(1)).as("kept"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // S = 105, T = 3412: k_big = 2599 → 4060 bp; k_mid = 649 → fully kept
    // would be 16225 bp → caps; k_small = 162 → caps
    assert(rates("big")._1 == 4060L, rates.toString)
    assert(rates("mid")._1 == 10000L && rates("mid")._2 == 400L, "mid caps, keeps all")
    assert(rates("small")._1 == 10000L && rates("small")._2 == 25L, "small caps, keeps all")
    // big stratum keeps ≈ 40.6% (md5-uniform)
    assert(rates("big")._2 > 2300 && rates("big")._2 < 2900, rates.toString)
    // deterministic across parallelism
    val out7 = Sampler.sampleTemperature(docs.repartition(7), "id", "s", targetBp = 5000)
    assert(out7.select("id").as[Long].collect().toSet ==
      out.select("id").as[Long].collect().toSet)
    // targetBp = 0 keeps nothing; 10000 keeps at least the capped strata
    assert(Sampler.sampleTemperature(docs, "id", "s", 0).count() == 0L)
    assert(Sampler.sampleTemperature(docs, "id", "s", 10000).count() >= 425L)
  }

  test("upsampleByEpochs: floor copies for all, fractional extra for a uniform md5 subset") {
    import spark.implicits._
    val docs = (0L until 1000L).map(i => (i, if (i % 2 == 0) "hi" else "lo")).toDF("id", "s")
    val epochs = Seq(("hi", 25000L), ("lo", 5000L)).toDF("s", "epochs_bp")
    val out = Sampler.upsampleByEpochs(docs, epochs, "id", "s").cache()
    assert(out.columns.toSeq == Seq("s", "id", "copy"))
    val perDoc = out.groupBy($"id", $"s").agg(count(lit(1)).as("n"), max($"copy").as("mx"))
      .as[(Long, String, Long, Long)].collect()
    perDoc.foreach { case (id, s, n, mx) =>
      assert(mx == n - 1, s"copy must be a dense 0-based index for $id")
      if (s == "hi") assert(n == 2 || n == 3, s"2.5 epochs -> 2 or 3 copies, got $n for $id")
      else assert(n == 1, s"0.5 epochs -> fractional only, got $n for $id")
    }
    // uniformity (loose): ~50% of "hi" docs get the third copy; ~50% of "lo" docs survive
    val hi3 = perDoc.count { case (_, s, n, _) => s == "hi" && n == 3 }
    val lo = perDoc.count(_._2 == "lo")
    assert(hi3 > 175 && hi3 < 325, s"third-copy share off: $hi3/500")
    assert(lo > 175 && lo < 325, s"0.5-epoch survivor share off: $lo/500")
    // the fractional extra-copy decision uses its OWN md5 window (hex chars
    // 17-24), disjoint from rate sampling's (1-8) and subStream's (9-16)
    val extras = perDoc.filter { case (_, s, n, _) => s == "hi" && n == 3 }.map(_._1).toSet
    val byBucket = docs.filter($"s" === "hi")
      .where(Sampler.upsampleBucket10k($"id") < 5000).select("id").as[Long].collect().toSet
    assert(extras == byBucket, "fractional copy must use the dedicated md5 window")
    // composition independence: among rate-sampling survivors (bucket10k
    // window), the fraction winning the extra copy stays ~frac_bp — with a
    // SHARED window every survivor at rate_bp >= frac_bp would win it
    val hiIds = docs.filter($"s" === "hi")
    val survivors = hiIds.where(Sampler.bucket10k($"id") < 5000).select("id").as[Long].collect().toSet
    val extraAmongSurvivors = extras.intersect(survivors).size.toDouble / survivors.size
    assert(extraAmongSurvivors > 0.35 && extraAmongSurvivors < 0.65,
      s"extra-copy rate among rate-sampling survivors must stay ~0.5, got $extraAmongSurvivors")
    // zero epochs drops the stratum; determinism across parallelism
    val none = Sampler.upsampleByEpochs(docs, Seq(("hi", 0L), ("lo", 0L)).toDF("s", "epochs_bp"), "id", "s")
    assert(none.count() == 0)
    val p1 = Sampler.upsampleByEpochs(docs.repartition(1), epochs, "id", "s")
    assert(p1.exceptAll(out).isEmpty && out.exceptAll(p1).isEmpty)
    out.unpersist()
  }

  test("importanceWeights: target-like docs outscore off-target; gramless docs score 0; deterministic") {
    import spark.implicits._
    import graft.sample.Importance
    // two styles: ids < 40 share the target's phrasing, 40..79 do not;
    // id 80 has one token (no bigram), id 81 is empty
    def phrase(i: Long) =
      if (i < 40) s"the quick brown fox jumps over the lazy dog ${i % 4}"
      else s"lorem ipsum dolor sit amet consectetur adipiscing elit ${i % 4}"
    val corpus = ((0L until 82L).map(i =>
      (i, if (i == 80) "word" else if (i == 81) "" else phrase(i)))).toDF("id", "text")
    val target = corpus.where($"id" < 20) // exemplar slice drawn from the target style
    val out = Importance.importanceWeights(corpus, "id", "text", target, "text",
      buckets = 256, n = 2)
    val rows = out.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.size == 82, "every corpus doc gets a score row")
    val hit = (0L until 40L).map(rows(_)._3)
    val miss = (40L until 80L).map(rows(_)._3)
    assert(hit.min > miss.max,
      s"every target-style doc must outscore every off-target doc (${hit.min} vs ${miss.max})")
    assert(rows(80L) == ((0L, 0L, 0L)) && rows(81L) == ((0L, 0L, 0L)),
      "docs with < 2 tokens have no grams and score 0")
    // weights probe must be a broadcast hash join (corpus grams never shuffle for it)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"weight probe must broadcast:\n$plan")
    // deterministic across parallelism
    val p1 = Importance.importanceWeights(corpus.repartition(7), "id", "text",
      target.repartition(3), "text", buckets = 256, n = 2)
    assert(p1.exceptAll(out).isEmpty && out.exceptAll(p1).isEmpty)
  }
}
