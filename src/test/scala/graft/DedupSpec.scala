package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import org.apache.spark.sql.DataFrame

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val longA = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
  private val longB = "the quick brown fox jumps over the lazy dog near the quiet river bank tonight" // 1-word diff
  private val longC = "completely different content about spark catalyst optimizer rules and physical plans here"

  test("exact dedup: groups by content, min-id survivor") {
    val d = df(1L -> "aaa", 2L -> "bbb", 3L -> "aaa", 4L -> "aaa", 5L -> "bbb")
    val groups = Dedup.exactGroups(d, "doc_id", "text").collect()
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(groups.toSeq == Seq((1L, 3L), (2L, 2L)))
    val kept = Dedup.dropExactDuplicates(d, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 2L))
  }

  test("shingles: 3-grams in order; short text → empty") {
    import spark.implicits._
    val sh = Seq("a b c d e").toDF("text")
      .select(Dedup.shingles(col("text")).as("sh")).collect()(0).getSeq[String](0)
    assert(sh == Seq("a b c", "b c d", "c d e"))
    val short = Seq("a b").toDF("text")
      .select(Dedup.shingles(col("text")).as("sh")).collect()(0).getSeq[String](0)
    assert(short.isEmpty)
  }

  test("minhash: identical text → identical signature; sig is deterministic") {
    val d = df(1L -> longA, 2L -> longA, 3L -> longC)
    val sigs = Dedup.minhashSignatures(d, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getString).toVector).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("LSH: exact duplicates always collide; near-dups (1-word suffix diff) share most bands") {
    val d = df(1L -> longA, 2L -> longA, 3L -> longB, 4L -> longC)
    val pairs = Dedup.lshCandidatePairs(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._2 == 4L || p._1 == 4L))
  }

  test("jaccard: inter/uni integer sizes over distinct shingle sets") {
    import spark.implicits._
    val d = df(1L -> "a b c d e", 2L -> "a b c d x")
    val pairs = Seq((1L, 2L)).toDF("id1", "id2")
    val j = Dedup.jaccardForPairs(d, pairs, "doc_id", "text").collect()(0)
    // sets: {abc,bcd,cde} vs {abc,bcd,cdx} → inter 2, uni 4
    assert(j.getLong(2) == 2 && j.getLong(3) == 4)
  }

  test("jaccardWithinGroups only pairs within the same group") {
    import spark.implicits._
    val d = Seq((1L, "a b c d e", "g1"), (2L, "a b c d e", "g1"), (3L, "a b c d e", "g2"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.jaccardWithinGroups(d, "doc_id", "text", "source")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("dropNearDuplicates: keep-min-id survivors at the jaccard threshold") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = Seq(
      1L -> base, // kept (min of the 1~2 pair)
      2L -> (base + " extra"), // near-dup of 1 → dropped
      3L -> "completely different words nothing shared here at all today ok", // kept
      4L -> base // exact dup of 1 → dropped
    ).toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicates(d, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("simhash: identical → equal; near-dup → small hamming; pairs join finds dups") {
    import spark.implicits._
    val d = df(1L -> longA, 2L -> longA, 3L -> longB, 4L -> longC)
    val h = d.select(col("doc_id"), Dedup.simhash64("text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    val hamNear = java.lang.Long.bitCount(h(1L) ^ h(3L))
    val hamFar = java.lang.Long.bitCount(h(1L) ^ h(4L))
    assert(hamNear < hamFar)
    val pairs = Dedup.simhashNearDupPairs(d, "doc_id", "text", maxHamming = 3)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("simhashNearDupPairs equals the brute-force hamming scan (pigeonhole exactness)") {
    import spark.implicits._
    // the driver-gated input: real docs + identical-text copies (id + 10^6)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val d = docs.union(docs.select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text")))
    val sigs = d.select(col("doc_id"), Dedup.simhash64Native(d, "text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    // brute force: all pairs with hamming ≤ 3 — banding into four 16-bit
    // chunks is EXACT for this threshold (hamming ≤ 3 ⇒ ≥ 1 chunk equal)
    val brute = (for {
      (i1, h1) <- sigs; (i2, h2) <- sigs
      if i1 < i2 && java.lang.Long.bitCount(h1 ^ h2) <= 3
    } yield (i1, i2)).toSet
    val banded = Dedup.simhashNearDupPairs(d, "doc_id", "text", maxHamming = 3)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute)
    assert(banded.size >= 500) // every identical-copy pair is present
  }
}
