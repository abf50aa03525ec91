package graft

import graft.text.TextAnalytics._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def one(text: String, c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(text).toDF("text").select(c).collect()(0).get(0)
  }

  test("graft_nfc: decomposed sequences compose; NFC input and ASCII are fixed points; null propagates") {
    import spark.implicits._
    val d = Seq("x").toDF("text")
    def nfc(s: String): String =
      Seq(s).toDF("t").select(nfcNative(d)(col("t"))).collect()(0).getString(0)
    assert(nfc("Joa\u0303o") == "João") // a + U+0303 → ã
    assert(nfc("cafe\u0301") == "café")
    assert(nfc("A\u030Angstro\u0308m") == "Ångström")
    assert(nfc("éclair") == "éclair", "already-NFC input unchanged")
    assert(nfc("plain ascii text.") == "plain ascii text.")
    assert(nfc("") == "")
    // idempotence: nfc(nfc(x)) == nfc(x) on a mixed corpus
    val mixed = Seq("João", "café au lait", "ascii", "é́").toDF("t")
    val twice = mixed.select(nfcNative(mixed)(nfcNative(mixed)(col("t"))).as("a"),
      nfcNative(mixed)(col("t")).as("b")).collect()
    twice.foreach(r => assert(r.getString(0) == r.getString(1)))
    // null row
    val n = Seq[Option[String]](None).toDF("t").select(nfcNative(d)(col("t"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("graft_nfc: supplementary-plane text (emoji) passes through byte-identically") {
    import spark.implicits._
    val d = Seq("x").toDF("text")
    val s = "mixed 😀 emoji café"
    val out = Seq(s).toDF("t").select(nfcNative(d)(col("t"))).collect()(0).getString(0)
    assert(out == "mixed 😀 emoji café")
  }

  test("tokenCount: words, collapsing whitespace, empty/blank → 0") {
    assert(one("a b  c", tokenCount(col("text"))) == 3)
    assert(one("  hello   world  ", tokenCount(col("text"))) == 2)
    assert(one("", tokenCount(col("text"))) == 0)
    assert(one("   ", tokenCount(col("text"))) == 0)
  }

  test("bpeTokenCount: letter runs, ≤3-digit groups, single marks; empty → 0") {
    // "Hello" "," "world" → 3 (punctuation charged separately)
    assert(one("Hello, world", bpeTokenCount(col("text"))) == 3L)
    // "1234567" → "123"+"456"+"7"; "x" → 4 total
    assert(one("1234567 x", bpeTokenCount(col("text"))) == 4L)
    // "don" "'" "t" "!" "!" — marks are single tokens, ws counts 2
    assert(one("don't !", bpeTokenCount(col("text"))) == 4L)
    assert(one("", bpeTokenCount(col("text"))) == 0L)
    assert(one("   ", bpeTokenCount(col("text"))) == 0L)
  }

  test("stopTokenCount: word-boundary exact, adjacent stopwords, case-folded") {
    // "the" + "and" + "the" + "of" — "theme"/"other" must not match
    assert(one("The cat and the theme of other", stopTokenCount(col("text"))) == 4L)
    // adjacent stopwords each counted (\b consumes no chars)
    assert(one("of the in a", stopTokenCount(col("text"))) == 4L)
    assert(one("xyzzy qwerty", stopTokenCount(col("text"))) == 0L)
    assert(one("", stopTokenCount(col("text"))) == 0L)
  }

  test("repetitionStats: dup-token mass, hottest bigram, degenerate docs") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a b"),        // 4 tokens, 2 distinct; bigram "a a" ×2
      (2L, "x y z"),          // no repetition; every bigram ×1
      (3L, "w"),              // single token: no bigrams
      (4L, "")                // empty: all zeros
    ).toDF("doc_id", "text")
    val out = repetitionStats(df, "doc_id", "text")
      .orderBy("doc_id").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(out(0) == ((1L, 4L, 2L, 2L, 2L, true)))  // bigram 2/3 > 20%
    assert(out(1) == ((2L, 3L, 3L, 0L, 1L, true)))  // bigram 1/2 > 20%
    assert(out(2) == ((3L, 1L, 1L, 0L, 0L, false)))
    assert(out(3) == ((4L, 0L, 0L, 0L, 0L, false)))
  }

  test("fingerprint: invariant to case and whitespace runs, sensitive to content") {
    val a = one("Hello   World", fingerprint(col("text")))
    val b = one("  hello world ", fingerprint(col("text")))
    val c = one("hello worlds", fingerprint(col("text")))
    assert(a == b)
    assert(a != c)
  }

  test("gopher rules: each threshold fails a crafted doc; a plain one passes") {
    val good = (1 to 12).map(i => s"word$i").mkString(" ") // 12 words, all alpha
    assert(one(good, isGopherQuality(col("text"), minWords = 10)) == true)
    // too few words
    assert(one("just three words", isGopherQuality(col("text"), minWords = 10)) == false)
    // symbol-heavy: 10 hashes vs 22 words -> symbols*10 > words
    assert(one(good + " " + ("# " * 10).trim,
      isGopherQuality(col("text"), minWords = 10)) == false)
    // mean word length > 10
    val longWords = (1 to 12).map(_ => "a" * 15).mkString(" ")
    assert(one(longWords, isGopherQuality(col("text"), minWords = 10)) == false)
    // every line a bullet -> bullet fraction 100% > 90%
    val bullets = (1 to 12).map(i => s"- item$i word word").mkString("\n")
    assert(one(bullets, isGopherQuality(col("text"), minWords = 10)) == false)
    // numeric soup: alpha-word share < 80%
    val numeric = ((1 to 10).map(_.toString) ++ Seq("a", "b")).mkString(" ")
    assert(one(numeric, isGopherQuality(col("text"), minWords = 10)) == false)
    // counters themselves
    assert(one("- a\n* b\nplain\nend...", bulletLineCount(col("text"))) == 2)
    assert(one("- a\n* b\nplain\nend...", ellipsisLineCount(col("text"))) == 1)
    assert(one("## x ... y ....", gopherSymbolCount(col("text"))) == 3L + 1L)
    assert(one("a1 22 _x 3b", alphaWordCount(col("text"))) == 3)
  }

  test("char-class counters") {
    assert(one("a.b,c!?", punctChars(col("text"))) == 4)
    assert(one("AbC dE", upperChars(col("text"))) == 3)
    assert(one("a1b22", digitChars(col("text"))) == 3)
  }

  test("markerMass counts word-boundary occurrences only") {
    assert(one("the cat theme and then the end", markerMass(col("text"), Seq("the"))) == 10) // " the " twice: 2×5
    assert(one("breathe other", markerMass(col("text"), Seq("the"))) == 0)
  }

  test("langId: marker argmax with precedence, und fallback") {
    assert(one("the cat and the dog is here", langId(col("text"))) == "en")
    assert(one("der hund und die katze und das", langId(col("text"))) == "de")
    assert(one("le chat et les chiens et", langId(col("text"))) == "fr")
    assert(one("xyzzy qwerty", langId(col("text"))) == "und")
    assert(one("", langId(col("text"))) == "und")
  }

  test("paragraphLangs: per-paragraph split, per-paragraph argmax, und for marker-free") {
    import spark.implicits._
    val doc =
      "the cat and the dog is here\n" + // en
      "der hund und die katze und das\n" + // de
      "le chat et les chiens et\n" + // fr
      "\n" + // blank → und, 0 tokens
      "12345 !!!" // marker-free → und
    val d = Seq((7L, doc)).toDF("doc_id", "text")
    val rows = paragraphLangs(d, "doc_id", "text")
      .orderBy("pos").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.toSeq == Seq(
      (0L, 7L, "en"), (1L, 7L, "de"), (2L, 6L, "fr"), (3L, 0L, "und"), (4L, 2L, "und")))
    // single-paragraph doc degenerates to langId
    val single = Seq((1L, "the cat and the dog is here")).toDF("doc_id", "text")
    val s = paragraphLangs(single, "doc_id", "text").collect()
    assert(s.length == 1 && s(0).getString(3) == "en" && s(0).getLong(1) == 0L)
  }

  test("invisible/bidi sanitization: counts, strip, dedup-equality restore, Trojan Source flag") {
    import graft.text.TextAnalytics._
    assert(one("ab\u200Bc", invisibleChars(col("text"))) == 1L)
    assert(one("a\u200B\u200C\u200D\u2060\u00AD\uFEFFz", invisibleChars(col("text"))) == 6L)
    assert(one("ab\u200Bc", stripInvisible(col("text"))) == "abc")
    assert(one("x \u202Eevil\u202C y", bidiChars(col("text"))) == 2L)
    assert(one("x \u2066iso\u2069 y", bidiChars(col("text"))) == 2L)
    assert(one("x \u202Eevil\u202C y", stripInvisible(col("text"))) == "x evil y")
    assert(one("plain ascii.", stripInvisible(col("text"))) == "plain ascii.")
    assert(one("plain ascii.", invisibleChars(col("text"))) == 0L)
    // the dedup-evasion case: ZWSP-interleaved copy fingerprints equal
    // after stripping
    import spark.implicits._
    val d = Seq(("the same boilerplate line", "the\u200B same\u200B boilerplate\u200B line"))
      .toDF("a", "b")
    val r = d.select((fingerprint(stripInvisible(col("a"))) ===
      fingerprint(stripInvisible(col("b")))).as("eq")).collect()(0).getBoolean(0)
    assert(r, "stripping must restore fingerprint equality")
  }

  test("C4 recipe: each line rule and each page gate fires exactly as published") {
    import spark.implicits._
    def stats(text: String) = {
      val d = Seq((1L, text)).toDF("doc_id", "text")
      val r = graft.text.C4.c4Stats(d, "doc_id", "text", Seq("casino")).collect()(0)
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))
    }
    // three clean ≥5-word terminally-punctuated sentences → kept page
    val good = "The first sentence has enough words here.\n" +
      "Another proper sentence is written right here!\n" +
      "Is the third sentence also long enough?"
    assert(stats(good) == (3L, 3L, 3L, false, true))
    // line rules: no terminal punct / < 5 words / javascript each drop
    assert(stats(good + "\nno terminal punctuation on this line") ==
      (4L, 3L, 3L, false, true))
    assert(stats(good + "\nToo short.")._2 == 3L)
    assert(stats(good + "\nPlease enable javascript support now today.")._2 == 3L)
    // page gates: < 3 sentences, badword, lorem ipsum, curly brace
    assert(stats("Only two good sentences exist right here.\n" +
      "And the second one is here as well.") == (2L, 2L, 2L, false, false))
    assert(stats(good + "\nThe casino bonus never sleeps at night.") match {
      case (_, _, _, bad, keep) => bad && !keep
    })
    assert(!stats(good + "\nLorem ipsum dolor sit amet sample text.")._5)
    assert(!stats(good + "\nA brace { appears inside this long sentence.")._5)
    // quote counts as terminal punctuation but not as a sentence mark
    val q = "He said the words \"stop right there now\"\n" + good
    assert(stats(q) == (4L, 4L, 3L, false, true))
  }

  test("isQuality: rejects too-short, shouting, punctuation soup") {
    assert(one("this is a perfectly normal sentence with enough words", isQuality(col("text"))) == true)
    assert(one("too short", isQuality(col("text"))) == false)
    assert(one("AAAA BBBB CCCC DDDD EEEE FFFF", isQuality(col("text"))) == false)
    assert(one("a.b.c. d.e.f. g.h.i. j,k,l! m?n?o? p;q;r", isQuality(col("text"))) == false)
  }

  test("keyphrases: rare terms outrank common ones; ties break on term; rank dense per doc") {
    import spark.implicits._
    // "common" appears in all 3 docs (df 3); each doc has a unique term
    // (df 1) that must outrank it despite equal tf
    val d = Seq(
      (1L, "common alpha alpha"),
      (2L, "common beta"),
      (3L, "common gamma common")).toDF("doc_id", "text")
    val got = keyphrases(d, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getLong(5))).toMap
    // doc 1: alpha tf2/df1 → 2e6, common tf1/df3 → 333333
    assert(got((1L, 1L)) == (("alpha", 2000000L)), s"got $got")
    assert(got((1L, 2L)) == (("common", 333333L)))
    // doc 3: common tf2/df3 → 666666 vs gamma tf1/df1 → 1e6: gamma first
    assert(got((3L, 1L)) == (("gamma", 1000000L)))
    assert(got((3L, 2L)) == (("common", 666666L)))
    // tie: two unique terms with equal tf → term asc
    val t = Seq((9L, "zed ant")).toDF("doc_id", "text")
    val r = keyphrases(t, "doc_id", "text", k = 2)
      .orderBy("rank").collect().map(_.getString(2)).toSeq
    assert(r == Seq("ant", "zed"))
  }

  test("oovStats: top-K by tf with token tie-break, case-folded probe, empty doc zeros, exact ppm") {
    import spark.implicits._
    // tf: aa×4, bb×3, cc×2, dd×1 → vocabSize=2 keeps {aa, bb}
    val d = Seq(
      (1L, "aa aa bb cc"),      // 4 tokens, oov {cc} → 1 → 250000 ppm
      (2L, "AA bb BB cc dd"),   // case-folds: oov {cc, dd} → 2/5 → 400000
      (3L, "aa"),               // 0 oov
      (4L, "   ")).toDF("doc_id", "text") // empty → 0/0/0
    val got = oovStats(d, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((4L, 1L, 250000L)), s"got $got")
    assert(got(2L) == ((5L, 2L, 400000L)), s"got $got")
    assert(got(3L) == ((1L, 0L, 0L)), s"got $got")
    assert(got(4L) == ((0L, 0L, 0L)), s"got $got")
    // tf tie at 1: dd vs ee — token ASC wins the last vocab slot
    val t = Seq((1L, "zz zz dd ee")).toDF("doc_id", "text")
    val g2 = oovStats(t, "doc_id", "text", vocabSize = 2)
      .collect()(0)
    assert((g2.getLong(1), g2.getLong(2)) == ((4L, 1L)), "vocab {zz, dd}: only ee is OOV")
  }

  test("oovStats: empty corpus and all-blank corpus — empty vocab is a typed literal, not an analysis error") {
    import spark.implicits._
    // the regression: an empty vocab built as array() types as
    // array<null> and array_contains fails ANALYSIS; the sorted-literal
    // probe must stay array<string> and simply match nothing
    val blank = Seq((1L, "   "), (2L, "")).toDF("doc_id", "text")
    val gotBlank = oovStats(blank, "doc_id", "text", vocabSize = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(gotBlank == Map(1L -> ((0L, 0L, 0L)), 2L -> ((0L, 0L, 0L))), s"got $gotBlank")
    val empty = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    assert(oovStats(empty, "doc_id", "text", vocabSize = 4).collect().isEmpty)
  }

  test("oovStats: green at the production vocabSize=32768 with the O(log K) probe") {
    import spark.implicits._
    // corpus with > 2 distinct tokens so the big-K run is exercised end
    // to end; at K=32768 every corpus token is in-vocab by construction
    // (top-K covers all), so every row must read 0 OOV — and a smaller K
    // on the same corpus must still find OOV rows (probe not degenerate)
    val d = (0L until 50L).map(i => (i, s"tok$i common${i % 3} aa")).toDF("doc_id", "text")
    val big = oovStats(d, "doc_id", "text", vocabSize = 32768).collect()
    assert(big.length == 50 && big.forall(_.getLong(2) == 0L))
    val small = oovStats(d, "doc_id", "text", vocabSize = 4).collect()
    assert(small.exists(_.getLong(2) > 0L))
  }
}
