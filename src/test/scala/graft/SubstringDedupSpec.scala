package graft

import graft.dedup.SubstringDedup
import graft.text.QualityClassifier
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the ExactSubstr spans (first occurrence
  * wins, gaps-and-islands merge, in-place removal) and the naive-Bayes
  * quality classifier (smoothed integer posterior, broadcast probe,
  * unseen-bucket prior).
  */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def spans(d: DataFrame, k: Int): Seq[(Long, Long, Long, Long, Long)] =
    SubstringDedup.duplicatedSpans(d, "doc_id", "text", k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2)).toSeq

  private def dropped(d: DataFrame, k: Int): Seq[(Long, Long, Long, String)] =
    SubstringDedup.dropDuplicatedSpans(d, "doc_id", "text", k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq

  test("cross-doc duplicated substring: one merged span, first copy untouched") {
    val d = df(
      1L -> "a b c d e f",
      2L -> "x y a b c d z")
    // doc 2 grams at pos 2 ("a b c") and 3 ("b c d") are non-first → one
    // island → span [2, 3+2] = [2, 5]
    assert(spans(d, 3) == Seq((2L, 2L, 5L, 4L, 2L)))
    assert(dropped(d, 3) == Seq(
      (1L, 6L, 6L, "a b c d e f"),
      (2L, 7L, 3L, "x y z")))
  }

  test("within-doc self-repeat: the second copy is a span, the first survives") {
    val d = df(3L -> "p q r s p q r s")
    // dup gram starts at pos 4 ("p q r") and 5 ("q r s") → span [4, 7]
    assert(spans(d, 3) == Seq((3L, 4L, 7L, 4L, 2L)))
    assert(dropped(d, 3) == Seq((3L, 8L, 4L, "p q r s")))
  }

  test("non-adjacent duplicated passages stay separate spans") {
    val d = df(
      1L -> "a b c d e f",
      4L -> "a b c m m m d e f")
    // doc 4: pos 0 ("a b c") and pos 6 ("d e f") are non-first; pos 1-5
    // grams straddle the unique m-block → two islands [0,2] and [6,8]
    assert(spans(d, 3) == Seq((4L, 0L, 2L, 3L, 1L), (4L, 6L, 8L, 3L, 1L)))
    assert(dropped(d, 3) == Seq(
      (1L, 6L, 6L, "a b c d e f"),
      (4L, 9L, 3L, "m m m")))
  }

  test("documents shorter than k emit no grams and pass through whole") {
    val d = df(1L -> "a b", 2L -> "a b")
    assert(spans(d, 3).isEmpty)
    assert(dropped(d, 3) == Seq((1L, 2L, 2L, "a b"), (2L, 2L, 2L, "a b")))
  }

  test("exact duplicate documents: the later copy empties entirely") {
    val d = df(1L -> "u v w x y", 2L -> "u v w x y")
    assert(spans(d, 3) == Seq((2L, 0L, 4L, 5L, 3L)))
    assert(dropped(d, 3) == Seq(
      (1L, 5L, 5L, "u v w x y"),
      (2L, 5L, 0L, "")))
  }

  // ---- naive-Bayes quality classifier ----

  private def nb(d: DataFrame, buckets: Int): Seq[(Long, Long, Long, Long, Boolean)] =
    QualityClassifier.trainAndScore(d, "doc_id", "text", "y", buckets)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .sortBy(_._1).toSeq

  private def labeled(rows: (Long, String, Boolean)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "y")
  }

  test("discriminative corpus: positive doc keeps, negative doc rejected") {
    // no-collision layout at B=4096; hand posteriors: 'good' bucket
    // cp=3,cn=0 → 800000 ppm; 'good good' cp=2 → 750000; mirrored for bad
    val d = labeled(
      (1L, "good good good", true),
      (2L, "bad bad bad", false))
    val out = nb(d, 4096)
    assert(out(0) == ((1L, 5L, 3900000L, 780000L, true)))
    assert(out(1) == ((2L, 5L, 1100000L, 220000L, false)))
  }

  test("uninformative corpus (identical pos/neg text): everything sits on the 1/2 tie and keeps") {
    val d = labeled((1L, "aa aa", true), (2L, "aa aa", false))
    val out = nb(d, 64)
    assert(out.forall(_._4 == 500000L), out.toString)
    assert(out.forall(_._5), "tie must keep (>= semantics)")
  }

  test("unseen buckets score the 500000 ppm prior when probing a frozen model") {
    val train = labeled((1L, "alpha beta", true))
    val w = QualityClassifier.nbWeights(train, "text", "y", 4096)
    val out = QualityClassifier.score(
        df(9L -> "zulu xray"), "doc_id", "text", w, 4096)
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getBoolean(4)))
    // 3 features (2 unigrams + 1 bigram), all unseen → prior everywhere
    assert(out.toSeq == Seq((3L, 500000L, true)))
  }

  test("classifier probe broadcasts the weight table (no gram-keyed sort-merge)") {
    val d = labeled((1L, "one two three", true), (2L, "four five six", false))
    val scored = QualityClassifier.trainAndScore(d, "doc_id", "text", "y", 64)
    scored.collect()
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"weight probe must broadcast:\n$plan")
  }
}
