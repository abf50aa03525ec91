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

  test("paragraph dedup: first occurrence wins across docs; within-doc repeats keep the earliest") {
    val d = df(
      1L -> "shared para\nown one\nself\nself",
      2L -> "own two\nshared para\nother",
      3L -> "shared para\nown three")
    val out = graft.dedup.LineDedup.dropDupParagraphs(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    // doc 1 owns the first "shared para" and the first "self"
    assert(out(0) == ((1L, 4L, 3L, "shared para\nown one\nself")))
    // doc 2's copy (pos 1) loses to doc 1's (doc 1 < doc 2)
    assert(out(1) == ((2L, 3L, 2L, "own two\nother")))
    assert(out(2) == ((3L, 2L, 1L, "own three")))
  }

  test("paragraph dedup: duplicate-free corpus is untouched; all-dup doc empties") {
    val d = df(1L -> "a\nb", 2L -> "c\nd", 3L -> "a\nb")
    val out = graft.dedup.LineDedup.dropDupParagraphs(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).sortBy(_._1)
    assert(out(0) == ((1L, 2L, "a\nb")))
    assert(out(1) == ((2L, 2L, "c\nd")))
    assert(out(2) == ((3L, 0L, "")))
  }

  test("line dedup: corpus-frequent lines dropped, unique prose kept in order") {
    val nav = "NAV: home about"
    val foot = "(c) 2024 portal"
    val d = df(
      1L -> s"$nav\nunique one\n$foot",
      2L -> s"$nav\nunique two\n$foot",
      3L -> s"$nav\nunique three\n$foot",
      4L -> s"body only\nsecond line")
    val out = graft.dedup.LineDedup.dropFrequentLines(d, "doc_id", "text", minDf = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(out(0) == ((1L, 3L, 1L, "unique one")))
    assert(out(1) == ((2L, 3L, 1L, "unique two")))
    assert(out(2) == ((3L, 3L, 1L, "unique three")))
    // doc 4 has no frequent lines: both survive, order and join preserved
    assert(out(3) == ((4L, 2L, 2L, "body only\nsecond line")))
  }

  test("line dedup: DOCUMENT frequency — self-repetition cannot promote a line into the catalog") {
    // doc 1 repeats its own line 5 times; only 1 distinct doc contains it
    val d = df(
      1L -> Seq.fill(5)("spam spam spam").mkString("\n"),
      2L -> "normal text")
    val out = graft.dedup.LineDedup.dropFrequentLines(d, "doc_id", "text", minDf = 3L)
      .collect().map(r => (r.getLong(0), r.getString(3))).toMap
    assert(out(1L) == Seq.fill(5)("spam spam spam").mkString("\n"),
      "a single spammy document must not self-clean")
    assert(out(2L) == "normal text")
  }

  test("line dedup: repeated boilerplate occurrences inside one doc all drop; catalog cap deterministic") {
    val b = "cookie banner"
    val d = df(1L -> s"$b\nkeep me\n$b", 2L -> b, 3L -> s"$b\nother")
    val out = graft.dedup.LineDedup.dropFrequentLines(d, "doc_id", "text", minDf = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).sortBy(_._1)
    assert(out(0) == ((1L, 1L, "keep me")), "BOTH occurrences of the frequent line drop")
    assert(out(1) == ((2L, 0L, "")), "all-boilerplate doc cleans to empty")
    assert(out(2) == ((3L, 1L, "other")))
    // cap = 0 disables the catalog entirely → everything survives
    val uncapped = graft.dedup.LineDedup.dropFrequentLines(d, "doc_id", "text",
        minDf = 3L, maxCatalog = 0)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    assert(uncapped.map(_._2).toSeq == Seq(3L, 1L, 2L))
  }

  test("exact dedup: groups by content, min-id survivor") {
    val d = df(1L -> "aaa", 2L -> "bbb", 3L -> "aaa", 4L -> "aaa", 5L -> "bbb")
    val groups = Dedup.exactGroups(d, "doc_id", "text").collect()
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(groups.toSeq == Seq((1L, 3L), (2L, 2L)))
    val kept = Dedup.dropExactDuplicates(d, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 2L))
  }

  test("incremental dedup: drops index hits and within-batch dups, keeps novel docs") {
    import spark.implicits._
    // committed corpus holds "aaa"; the new batch re-crawls it (11, 14),
    // carries an internal duplicate ("bbb" at 12 < 13), and one novel doc
    val index = Seq("aaa").map(t => Tuple1(md5Hex(t))).toDF("fp")
    val batch = df(11L -> "aaa", 12L -> "bbb", 13L -> "bbb", 14L -> "aaa", 15L -> "ccc")
    val kept = Dedup.dropSeenDocuments(batch, "doc_id",
        org.apache.spark.sql.functions.md5(org.apache.spark.sql.functions.col("text")),
        index, "fp")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(12L, 15L),
      "min-id batch survivor per key, minus keys already committed")
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

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

  test("connectedComponents: min-label per component; chain a~b~c keeps only a") {
    import spark.implicits._
    // chain 1~2~3 WITHOUT 1~3, plus a separate component {7,8}
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id1", "id2")
    val labels = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("CC survivor policy keeps ONE doc per cluster where greedy keeps id1s") {
    import spark.implicits._
    // pairs (1,3) and (2,3): greedy drops only id2s = {3} → keeps {1,2};
    // CC puts {1,2,3} in one component → keeps {1}
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("id1", "id2")
    val labels = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // end-to-end via texts: b bridges a and c (pure appends: shingle sets
    // nest, so jaccard(a,c) = |a|/|c| — sized to straddle the 0.5 cut)
    val a = base // 12 words → 10 shingles
    val b = base + " nu xi omicron pi rho sigma" // 18 words → 16 shingles; j(a,b)=10/16
    val c = b + " tau upsilon phi chi psi omega" // 24 words → 22 shingles; j(b,c)=16/22, j(a,c)=10/22<0.5
    val d = df(1L -> a, 2L -> b, 3L -> c)
    val verified = Dedup.jaccardForPairs(d, Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id1", "id2"),
      "doc_id", "text").collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(verified((1L, 2L))._1 * 100 >= verified((1L, 2L))._2 * 50) // a~b
    assert(verified((2L, 3L))._1 * 100 >= verified((2L, 3L))._2 * 50) // b~c
    assert(verified((1L, 3L))._1 * 100 < verified((1L, 3L))._2 * 50) // NOT a~c
    val kept = Dedup.dropNearDuplicatesCC(d, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L), s"chain must keep exactly the component min, got $kept")
  }

  test("minhashEstimates: identical docs estimate 10^6 exactly; estimate stays in [0, 10^6]") {
    import spark.implicits._
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = t + " extra words tail here now"
    val d = df(1L -> t, 2L -> t, 3L -> near,
      9L -> "completely different content with no shared shingles at all")
    val est = Dedup.minhashEstimates(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(est((1L, 2L)) == ((8L, 1000000L)), s"identical docs: all components match: $est")
    est.values.foreach { case (m, ppm) =>
      assert(m >= 0 && m <= 8 && ppm >= 0 && ppm <= 1000000L)
      assert(ppm == m * 1000000L / 8)
    }
    assert(!est.keySet.exists(p => p._1 == 9L || p._2 == 9L),
      "disjoint doc must never become a candidate")
  }

  test("best survivor: cluster keeps its LONGEST member, not the min id; tie breaks to min id") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    // chain 1~2~3 as in the CC test, but now the LAST doc is longest —
    // the min-id policy would keep 1; the quality policy must keep 3
    val a = base
    val b = base + " nu xi omicron pi rho sigma"
    val c = b + " tau upsilon phi chi psi omega"
    val d = df(1L -> a, 2L -> b, 3L -> c)
    val kept = Dedup.dropNearDuplicatesBest(d, "doc_id", "text",
        graft.text.TextAnalytics.tokenCount(col("text")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L), s"longest member must survive, got $kept")
    // exact-duplicate cluster: equal scores → min id survives (5 vs 6)
    val d2 = df(5L -> b, 6L -> b, 9L -> "unrelated content entirely different words here now")
    val kept2 = Dedup.dropNearDuplicatesBest(d2, "doc_id", "text",
        graft.text.TextAnalytics.tokenCount(col("text")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(5L, 9L), s"tie → min id; singletons untouched: got $kept2")
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

  test("containment: quote-in-document scores 10^6 ppm where Jaccard stays small; hand math; threshold prunes") {
    import spark.implicits._
    val big = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"     // 8 shingles
    val quote = "w1 w2 w3 w4 w5"                    // 3 shingles, all ⊂ big
    val partial = "w1 w2 w3 w4 w5 zz"               // 4 shingles, 3 shared with big
    val d = Seq((1L, 0L, big), (2L, 0L, quote), (3L, 0L, partial), (4L, 1L, big))
      .toDF("doc_id", "fam", "text")
    val got = Dedup.containmentWithinGroups(d, "doc_id", "text", "fam", n = 3, minPpm = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // quote fully contained: 3/3 → 10^6 ppm; its Jaccard would be 3/8
    assert(got((1L, 2L)) == ((3L, 8L, 3L, 1000000L)), got.toString)
    // partial: 3 shared / min(8,4) → 750000 exactly
    assert(got((1L, 3L)) == ((3L, 8L, 4L, 750000L)))
    // quote vs partial: shingles of quote (3) all in partial → 10^6
    assert(got((2L, 3L)) == ((3L, 3L, 4L, 1000000L)))
    // cross-family pair (1,4) never materializes despite identical text
    assert(!got.contains((1L, 4L)))
    // threshold prunes the partial pair but keeps full containments
    val pruned = Dedup.containmentWithinGroups(d, "doc_id", "text", "fam",
      n = 3, minPpm = 800000L).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned == Set((1L, 2L), (2L, 3L)))
  }

  test("decontamination spans: envelope localizes the quoted passage exactly; clean docs absent") {
    import spark.implicits._
    import graft.dedup.Decontaminate
    def words(seed: String, n: Int): String = (0 until n).map(i => s"$seed$i").mkString(" ")
    val quote = words("bench", 12) // 12 tokens → 5 8-grams
    // doc 1 embeds the quote at token offset 20; doc 2 is clean
    val corpus = Seq(
      (1L, words("a", 20) + " " + quote + " " + words("b", 20)),
      (2L, words("c", 60))).toDF("doc_id", "text")
    val bench = Seq(quote).toDF("bench_text")
    val got = Decontaminate.overlapSpans(corpus, "doc_id", "text", bench, "bench_text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // grams 20..24 match (5 of them); envelope = 24-20+8 = 12 tokens — the
    // quote exactly; excising tokens [20, 32) removes all contamination
    assert(got.toSeq == Seq((1L, 5L, 20L, 24L, 12L)))
  }

  test("winnowing: shared-passage guarantee, density ~2/(w+1), short docs emit nothing") {
    import spark.implicits._
    import graft.dedup.Winnow
    val k = 5; val w = 4
    def words(seed: String, n: Int): String =
      (0 until n).map(i => s"$seed$i").mkString(" ")
    // docs 1 and 2 share a passage of exactly w+k-1 = 8 tokens embedded in
    // distinct surroundings — the paper's Thm-2 floor: they MUST share a
    // selected fingerprint. Doc 3 is unrelated; doc 4 is too short.
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val d = Seq(
      (1L, words("x", 30) + " " + shared + " " + words("y", 30)),
      (2L, words("p", 25) + " " + shared + " " + words("q", 35)),
      (3L, words("z", 80)),
      (4L, "only four tokens here")).toDF("doc_id", "text")
    val sel = Winnow.winnowFingerprints(d, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(!sel.exists(_._1 == 4L), "sub-(w+k-1) docs emit nothing")
    val f1 = sel.filter(_._1 == 1L).map(_._3).toSet
    val f2 = sel.filter(_._1 == 2L).map(_._3).toSet
    assert((f1 & f2).nonEmpty, "the guarantee: a shared w+k-1 passage must collide")
    assert((sel.filter(_._1 == 3L).map(_._3).toSet & f1).isEmpty, "unrelated docs don't")
    // density: selected/grams within [1/w, ~2/(w+1)+slack] on the long doc
    val g3 = 80 - k + 1
    val n3 = sel.count(_._1 == 3L)
    assert(n3 >= g3 / w && n3 <= (2.0 / (w + 1) * g3 * 1.5).toInt, s"density off: $n3 of $g3")
    // pairing consumer localizes the copy: only (1,2) pairs at minShared=1
    val pairs = Winnow.sharedPassagePairs(
      Winnow.winnowFingerprints(d, "doc_id", "text", k, w), "doc_id", minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }
}
