package graft

import graft.text.BpeTrainer
import org.scalatest.funsuite.AnyFunSuite

/** Pins the BPE training loop to canonical semantics (Sennrich et al.
  * fixture computed by hand), determinism across parallelism, and
  * iteration-1 agreement with the single-shot pair statistic.
  */
class BpeTrainerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // corpus frequencies: low×5 lower×2 newest×6 widest×3 — hand-derived
  // merge order: (e,s)9 → (es,t)9 → (l,o)7 → (lo,w)7 → (e,w)6
  private def fixture = {
    import spark.implicits._
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    words.toDF("text")
  }

  test("learnMerges reproduces the classic fixture's merge table") {
    import spark.implicits._
    val m = BpeTrainer.learnMerges(fixture, "text", 5)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(m == Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "l", "o", 7L),
      (4, "lo", "w", 7L),
      (5, "e", "w", 6L)), s"got $m")
  }

  test("merge learning is deterministic across input parallelism") {
    import spark.implicits._
    val a = BpeTrainer.learnMerges(fixture.repartition(1), "text", 5)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    val b = BpeTrainer.learnMerges(fixture.repartition(7), "text", 5)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(a == b)
  }

  test("iteration 1 agrees with the single-shot bpePairStats statistic") {
    import spark.implicits._
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val top = graft.stats.CorpusStats.bpePairStats(d, "text", topK = 1)
      .as[(String, Long)].collect().head
    val m1 = BpeTrainer.learnMerges(d, "text", 1)
      .as[(Int, String, String, Long)].collect().head
    // bpePairStats counts 2-char substrings; iteration 1 of the trainer
    // counts adjacent single-char symbols — identical by construction,
    // EXCEPT bpePairStats also counts pairs spanning a surrogate split.
    // The synthetic corpus is BMP-only, so the tops must agree exactly.
    assert(m1._2 + m1._3 == top._1 && m1._4 == top._2,
      s"trainer $m1 vs stats $top")
  }

  test("segment applies learned merges greedily (low/est) and is map-only") {
    import spark.implicits._
    val merges = BpeTrainer.learnMerges(fixture, "text", 5)
      .orderBy("rank").as[(Int, String, String, Long)].collect()
      .map(r => (r._2, r._3)).toSeq
    val in = Seq((1L, "lowest"), (2L, "newer low"), (3L, "")).toDF("doc_id", "text")
    val out = BpeTrainer.segment(in, "text", merges, "doc_id")
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("low", "est"), s"got ${out(1L)}")
    assert(out(2L) == Seq("n", "ew", "e", "r", "low"), s"got ${out(2L)}")
    assert(out(3L) == Seq())
    val plan = BpeTrainer.segment(in, "text", merges, "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"segmentation must be map-only:\n$plan")
  }

  test("a 100-merge sampled-learn run stays bounded and well-formed") {
    // the scale boundary BpeTrainer documents: learnMerges is for
    // sampled, tens-to-hundreds-of-merges training runs — this pins that
    // a 100-merge run over a small sample completes promptly, emits
    // strictly increasing ranks, and never repeats a merged pair
    import spark.implicits._
    val sample = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(200)
    val t0 = System.nanoTime()
    val merges = graft.text.BpeTrainer.learnMerges(sample, "text", numMerges = 100)
      .orderBy("rank").collect()
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"100 merges learned in $sec%.1f s")
    assert(merges.length <= 100 && merges.length > 50, s"got ${merges.length} merges")
    assert(merges.map(_.getInt(0)).toSeq == (1 to merges.length), "ranks gapless (1-based)")
    val pairs = merges.map(r => (r.getString(1), r.getString(2)))
    assert(pairs.distinct.length == pairs.length, "no pair learned twice")
    assert(merges.map(_.getLong(3)).forall(_ >= 1), "every merge has positive mass")
    // generous wall bound: the point is "minutes, not hours" — a CI-safe
    // ceiling that still fails if per-iteration cost regresses to corpus
    // scale
    assert(sec < 180, f"100 merges took $sec%.0f s — per-iteration cost regressed")
  }

  test("mergePair is left-to-right non-overlapping (canonical odd-run split)") {
    assert(BpeTrainer.mergePair(Vector("a", "a", "a", "a", "a"), "a", "a") ==
      Vector("aa", "aa", "a"))
    assert(BpeTrainer.charSymbols("a😀b") == Vector("a", "😀", "b"),
      "surrogate pairs stay one symbol")
  }
}
