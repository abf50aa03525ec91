package graft

import graft.text.Retrieval
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the fixed-point BM25 retrieval: hand-computed scores on a
  * fixture small enough to verify with pencil, ranking/tie determinism,
  * and the empty-text / absent-term edges. Value-exactness vs DuckDB at
  * corpus scale is gated by the driver (`t_bm25_topk`).
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def corpus(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  test("hand-computed fixed-point scores: N=4, avgdl=1, k1=1.2, b=0.75") {
    // dl: 3,1,2,0 → tot=6, avgdl = 6 DIV 4 = 1
    // df(apple)=2, df(banana)=2 → idf_x1m = ((4-2)*1e6) DIV 2 = 1_000_000
    // norm_x1m = 250000 + 750000*dl
    // doc0 apple tf=2: denom=2e6+3e6=5e6, ratio=(2*2.2e12) DIV 5e6=880000
    //      banana tf=1: denom=1e6+3e6=4e6, ratio=2.2e12 DIV 4e6=550000
    //      → score = 880000 + 550000 = 1_430_000, matched 2
    // doc1 apple tf=1 dl=1: denom=1e6+1.2e6=2.2e6, ratio=1_000_000 → 1_000_000
    // doc2 banana tf=1 dl=2: denom=1e6+2.1e6=3.1e6, ratio=2.2e12 DIV 3.1e6=709677
    val got = Retrieval.bm25TopK(
        corpus("apple banana apple", "apple", "cherry banana", ""),
        "id", "text", Seq("apple", "banana"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 2L, 1430000L), (1L, 1L, 1000000L), (2L, 1L, 709677L)),
      s"got $got")
  }

  test("rarer terms score higher at equal tf/dl; absent probe terms are inert") {
    // 'rare' df=1, 'common' df=4 → idf(rare) >> idf(common); doc dl equal
    val d = corpus("rare common", "x common", "y common", "z common")
    val got = Retrieval.bm25TopK(d, "id", "text",
        Seq("rare", "common", "neverseen"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got(0L) > got(1L), "doc with the rare term must outrank common-only docs")
    assert(got(1L) == got(2L) && got(2L) == got(3L), "identical (tf, dl) ⇒ identical score")
    // a probe term with df=0 contributes nothing and causes no error
    val without = Retrieval.bm25TopK(d, "id", "text", Seq("rare", "common"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == without, "df=0 probe term must be a no-op")
  }

  test("ranking ties break by ascending id; k truncates after the sort") {
    val d = corpus("tie", "tie", "tie", "tie", "tie")
    val got = Retrieval.bm25TopK(d, "id", "text", Seq("tie"), k = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 1L, 2L), s"got $got")
  }

  test("inverted index probe returns exactly what the corpus re-scan returns") {
    val texts = (0 until 400).map {
      case i if i % 9 == 0 => ""
      case i => Seq.fill(i % 7 + 1)(s"t${i % 19}").mkString(" ") + " probe extra"
    }
    val d = corpus(texts: _*)
    val terms = Seq("probe", "t4", "t11", "missing")
    val path = java.nio.file.Files.createTempDirectory("graft-idx-spec").toString
    graft.text.Retrieval.buildIndex(d, "id", "text", path, termBuckets = 8)
    val scan = Retrieval.bm25TopK(d, "id", "text", terms, 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val idx = Retrieval.bm25FromIndex(spark, path, "id", terms, 30, termBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(idx == scan, s"index path diverged:\nidx=$idx\nscan=$scan")
  }

  test("deterministic across parallelism; empty texts count toward N and avgdl") {
    import org.apache.spark.sql.functions.col
    val texts = (0 until 300).map {
      case i if i % 7 == 0 => ""
      case i => Seq.fill(i % 11 + 1)(s"w${i % 13}").mkString(" ") + " probe"
    }
    val d1 = corpus(texts: _*).repartition(1)
    val d7 = corpus(texts: _*).repartition(7, col("id"))
    val r1 = Retrieval.bm25TopK(d1, "id", "text", Seq("probe", "w3"), 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val r7 = Retrieval.bm25TopK(d7, "id", "text", Seq("probe", "w3"), 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(r1 == r7, "result must be partitioning-invariant")
    assert(r1.nonEmpty && r1.size == 20)
  }

  private def occs(d: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
    d.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("phrase: overlapping occurrences, duplicate terms, boundaries, case folding, no-match") {
    val d = corpus(
      "x the group y the group",       // 0: two occurrences, first at 1
      "the group",                      // 1: whole doc IS the phrase
      "group the",                      // 2: reversed — no match
      "the THE the",                    // 3: duplicate-term phrase fodder
      "the",                            // 4: shorter than the phrase
      "")                               // 5: empty
    val got = occs(Retrieval.phraseOccurrences(d, "id", "text", Seq("the", "group")))
    assert(got == Map(0L -> (2L, 1L), 1L -> (1L, 0L)), got.toString)
    // duplicate-term phrase: "the the" overlaps itself in doc 3 (THE
    // folds to the) → starts 0 and 1
    val dup = occs(Retrieval.phraseOccurrences(d, "id", "text", Seq("the", "the")))
    assert(dup == Map(3L -> (2L, 0L)), dup.toString)
    // 3-slot phrase across a boundary: only the full sequence matches
    val tri = occs(Retrieval.phraseOccurrences(d, "id", "text", Seq("y", "the", "group")))
    assert(tri == Map(0L -> (1L, 3L)), tri.toString)
    // absent vocabulary → empty result, not an error
    assert(Retrieval.phraseOccurrences(d, "id", "text", Seq("zz", "qq")).count() == 0L)
  }

  test("phrase index probe returns exactly what the corpus re-scan returns") {
    val d = corpus(
      "alpha beta gamma alpha beta", "beta alpha beta", "gamma gamma gamma",
      "alpha", "beta alpha", "")
    val path = java.nio.file.Files.createTempDirectory("graft-phrase-spec").toString
    Retrieval.buildIndex(d, "id", "text", path, termBuckets = 4)
    for (phrase <- Seq(Seq("alpha", "beta"), Seq("beta", "alpha", "beta"),
                       Seq("gamma", "gamma"))) {
      val scan = occs(Retrieval.phraseOccurrences(d, "id", "text", phrase))
      val idx = occs(Retrieval.phraseFromIndex(spark, path, "id", phrase, termBuckets = 4))
      assert(scan == idx, s"phrase $phrase: scan $scan vs index $idx")
      assert(scan.nonEmpty)
    }
    // self-overlapping "gamma gamma" in doc 2: starts 0 and 1
    assert(occs(Retrieval.phraseOccurrences(d, "id", "text", Seq("gamma", "gamma")))
      == Map(2L -> (2L, 0L)))
  }
}
