package graft

import graft.text.LangModel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LangModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("bigramPositions: adjacent lowercased pairs, one row per position") {
    val got = LangModel.bigramPositions(docs(1L -> "The cat sat the cat"), "doc_id", "text")
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq(
      (1L, "the", "cat"), (1L, "cat", "sat"), (1L, "sat", "the"), (1L, "the", "cat")))
  }

  test("bigramPositions: blank and single-token docs yield no bigrams") {
    val got = LangModel.bigramPositions(
      docs(1L -> "", 2L -> "   ", 3L -> "hello"), "doc_id", "text").count()
    assert(got == 0L)
  }

  test("bigramModel: conditional ppm by hand; pruning keeps probabilities proper") {
    // training: "a b a b a c" → bigrams ab, ba, ab, ba... write it out:
    // (a,b)(b,a)(a,b)(b,a)(a,c) → c12: (a,b)=2 (b,a)=2 (a,c)=1
    // c1(a)=3 (computed BEFORE pruning), c1(b)=2
    // minCount=2 prunes (a,c); p(a,b)=2e6 DIV 3=666666, p(b,a)=1000000
    val asMap = LangModel.bigramModel(docs(1L -> "a b a b a c"), "doc_id", "text", minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(asMap == Map(("a", "b") -> 666666L, ("b", "a") -> 1000000L))
  }

  test("bigramModel: per-context probabilities sum to ≤ 10^6 (property)") {
    val corpus = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick red fox runs over the lazy cat",
      3L -> "a quick brown dog jumps over a lazy fox")
    val sums = LangModel.bigramModel(corpus, "doc_id", "text", minCount = 1)
      .groupBy("w1").agg(sum("p_ppm").as("s"))
      .select("s").as[Long].collect()
    assert(sums.nonEmpty && sums.forall(s => s > 0 && s <= 1000000L))
  }

  test("lmScore: fluent text scores above gibberish; unseen bigrams floor at 0") {
    val train = docs(
      1L -> "the cat sat on the mat",
      2L -> "the cat ran on the mat",
      3L -> "the dog sat on the rug")
    val m = LangModel.bigramModel(train, "doc_id", "text", minCount = 2)
    val scored = LangModel.lmScore(
      docs(10L -> "the cat sat on the mat", 11L -> "zqx vvk jjw qqp", 12L -> "", 13L -> "one"),
      m, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    val (nFluent, seenFluent, avgFluent) = scored(10L)
    val (nGib, seenGib, avgGib) = scored(11L)
    assert(nFluent == 5L && seenFluent >= 4L && avgFluent > 0L)
    assert(nGib == 3L && seenGib == 0L && avgGib == 0L)
    // no bigrams to judge → all-zero row, never dropped
    assert(scored(12L) == ((0L, 0L, 0L)) && scored(13L) == ((0L, 0L, 0L)))
  }

  test("lmScore: hand-checked ppm arithmetic") {
    // model from "a b a b a c" minCount=1:
    // c12 (a,b)=2 (b,a)=2 (a,c)=1; c1(a)=3 c1(b)=2
    // p(a,b) = 666666, p(b,a) = 1000000, p(a,c) = 333333
    val m = LangModel.bigramModel(docs(1L -> "a b a b a c"), "doc_id", "text", minCount = 1)
    val r = LangModel.lmScore(docs(5L -> "a b a c x"), m, "doc_id", "text")
      .collect().head
    // bigrams: (a,b) 666666 + (b,a) 1000000 + (a,c) 333333 + (c,x) 0
    assert(r.getLong(1) == 4L)       // n_bigrams
    assert(r.getLong(2) == 3L)       // seen_bigrams
    assert(r.getLong(3) == 1999999L) // sum_ppm
    assert(r.getLong(4) == 499999L)  // avg_ppm = 1999999 DIV 4
  }

  test("stupidBackoffModel: three pruned count-ratio tables by hand") {
    // train: "a b c a b c a b d" → trigrams abc×2 bca×2 cab×2 abd×1;
    // contexts (a,b)=3 (b,c)=2 (c,a)=2 summed BEFORE pruning; bigrams
    // ab=3 bc=2 ca=2 bd=1 with c2 a=3 b=3 c=2; unigrams a=3 b=3 c=2 d=1, N=9
    val m = LangModel.stupidBackoffModel(
      docs(1L -> "a b c a b c a b d"), "doc_id", "text", minCount = 2)
    val tri = m.tri.as[(String, String, String, Long)].collect().toSet
    assert(tri == Set(("a", "b", "c", 666666L), ("b", "c", "a", 1000000L),
      ("c", "a", "b", 1000000L)), tri.toString)
    val bi = m.bi.as[(String, String, Long)].collect().toSet
    assert(bi == Set(("a", "b", 1000000L), ("b", "c", 666666L), ("c", "a", 1000000L)))
    val uni = m.uni.as[(String, Long)].collect().toSet
    assert(uni == Set(("a", 333333L), ("b", 333333L), ("c", 222222L)))
  }

  test("stupidBackoffScore: every backoff level and the miss floor, hand-checked ppm") {
    val m = LangModel.stupidBackoffModel(
      docs(1L -> "a b c a b c a b d"), "doc_id", "text", minCount = 2)
    // probe "x a b c b d a": (x,a,b) bi-hit 400000; (a,b,c) tri-hit
    // 666666; (b,c,b) uni-hit 53333; (c,b,d) MISS (bigram bd and unigram
    // d both pruned) → 0; (b,d,a) uni-hit 53333
    val got = LangModel.stupidBackoffScore(
      docs(2L -> "x a b c b d a", 3L -> "a b", 4L -> ""), m, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got(2L) == ((5L, 1L, 1L, 2L, 1173332L, 234666L)), got(2L).toString)
    // under 3 tokens: zero trigrams, zero score — never an error
    assert(got(3L) == ((0L, 0L, 0L, 0L, 0L, 0L)))
    assert(got(4L) == ((0L, 0L, 0L, 0L, 0L, 0L)))
  }
}
