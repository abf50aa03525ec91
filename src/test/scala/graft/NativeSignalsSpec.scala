package graft

import graft.text.TextAnalytics
import graft.text.TextAnalytics._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Field-by-field parity of the native single-pass signal kernels
  * ([[graft.functions.TextStatsExpression]] /
  * [[graft.functions.LangSignalsExpression]]) against the portable regex
  * `Column` formulations they replace — the SimHash discipline: the fast
  * path must be provably bit-equal to the engine-portable form the DuckDB
  * oracles replay, on adversarial literals, the real fixture corpus, AND
  * property-random strings.
  */
class NativeSignalsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  import spark.implicits._

  /** Both formulations of every stats field over one text column. */
  private def statsBoth(df: DataFrame): DataFrame = {
    val c = col("text")
    val toks = when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))
    val ts = textStatsNative(df)(c)
    df.select(
      c.as("text"),
      ts.getField("chars").as("n_chars"),
      length(c).cast("long").as("o_chars"),
      ts.getField("words").as("n_words"),
      tokenCount(c).cast("long").as("o_words"),
      ts.getField("punct").as("n_punct"),
      punctChars(c).cast("long").as("o_punct"),
      ts.getField("upper").as("n_upper"),
      upperChars(c).cast("long").as("o_upper"),
      ts.getField("digits").as("n_digits"),
      digitChars(c).cast("long").as("o_digits"),
      ts.getField("distinct_tokens").as("n_distinct"),
      size(array_distinct(toks)).cast("long").as("o_distinct"))
  }

  private def langBoth(df: DataFrame): DataFrame = {
    val c = col("text")
    val ls = langSignalsNative(df)(c)
    val portable = LangMarkers.map { case (lang, ms) =>
      markerMass(c, ms).cast("long").as(s"o_m_$lang") }
    df.select(
      Seq(c.as("text"),
        ls.getField("stop").as("n_stop"),
        stopTokenCount(c).as("o_stop"),
        langIdFromSignals(ls).as("n_lang"),
        langId(c).as("o_lang")) ++
        LangMarkers.map { case (lang, _) => ls.getField(s"m_$lang").as(s"n_m_$lang") } ++
        portable: _*)
  }

  private def assertStatsParity(df: DataFrame): Unit =
    statsBoth(df).collect().foreach { r =>
      for (f <- Seq("chars", "words", "punct", "upper", "digits", "distinct"))
        assert(r.getLong(r.fieldIndex(s"n_$f")) == r.getLong(r.fieldIndex(s"o_$f")),
          s"field $f diverges on text=${r.getString(0).take(120).replace("\n", "\\n")}")
    }

  private def assertLangParity(df: DataFrame): Unit =
    langBoth(df).collect().foreach { r =>
      assert(r.getLong(r.fieldIndex("n_stop")) == r.getLong(r.fieldIndex("o_stop")),
        s"stop diverges on ${r.getString(0).take(120)}")
      assert(r.getString(r.fieldIndex("n_lang")) == r.getString(r.fieldIndex("o_lang")),
        s"lang diverges on ${r.getString(0).take(120)}")
      LangMarkers.foreach { case (lang, _) =>
        assert(r.getLong(r.fieldIndex(s"n_m_$lang")) == r.getLong(r.fieldIndex(s"o_m_$lang")),
          s"m_$lang diverges on ${r.getString(0).take(120)}")
      }
    }

  private val adversarial = Seq(
    "",
    " ",
    "     ",
    "\t",                              // non-space ws survives trim → leading empty token
    "\tleading tab",
    "trailing tab\t",
    "ab\fc\rd\ne",               // every Java \s char as a separator
    "the the the",                     // adjacent markers: non-overlapping undercount
    "of the in a and the of",
    "the. the, the! the?",             // \b across punctuation vs space-padded markers
    "theme other bathe athe the1 the_x", // substrings/word-char neighbors never match
    "THE AND OF IS",                   // case folding
    "el la los es el la",              // es markers
    "der die und das",                 // de markers
    "le les des et",                   // fr markers
    "x. y, z; w: v! u?",
    "UPPER Case MiXeD 0123456789",
    "word " * 400,                     // long repetitive doc
    "unique" + (1 to 200).map(i => s" tok$i").mkString,
    "é café naïve 中文 漢字 привет مرحبا",
    "mixed 😀 emoji café the and",
    "a  b   c    d",
    " the ",                           // markers at trimmed boundaries
    "the",                             // marker without padding
    "dup dup dup dup unique",
    "a-a a-a b_b b_b the-ory"
  )

  test("native text stats == portable regex formulations (adversarial literals)") {
    assertStatsParity(adversarial.toDF("text"))
  }

  test("native lang signals == portable regex formulations (adversarial literals)") {
    assertLangParity(adversarial.toDF("text"))
  }

  test("native signals == portable on the fixture corpus (sf0.001 documents)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
    assertStatsParity(d)
    assertLangParity(d)
  }

  test("native signals == portable on seeded-random word soup") {
    // alphabet biased toward the interesting classes: ws variants, markers,
    // punctuation, digits, unicode -- 300 random docs checked in one pass
    val rnd = new Random(20260819)
    val atoms = Vector(
      "the", "and", "of", "is", "el", "la", "und", "das", "les", "et",
      "a", "in", "that", "have", "theme", "athe", "the1",
      " ", "  ", "\t", "\n", "\r", "", "\f",
      ".", ",", ";", ":", "!", "?", "_", "-",
      "Word", "UPPER", "x9", "42", "q",
      "\u00e9", "\u4e2d", "\u043f", "\u0645", "\ud83d\ude00")
    def doc(): String =
      Vector.fill(rnd.nextInt(60))(atoms(rnd.nextInt(atoms.size))).mkString
    val df = Vector.fill(300)(doc()).toDF("text")
    assertStatsParity(df)
    assertLangParity(df)
  }

  test("repetitionStats (native, map-only) == repetitionStatsRelational row-for-row") {
    val edge = Seq(
      1L -> "",
      2L -> "   ",
      3L -> "one",
      4L -> "go go go go go",
      5L -> "a b a b a b a b c",
      6L -> "all tokens unique here now",
      7L -> ("spam ham " * 50).trim,
      8L -> "\ttab separated\ttokens\t"
    ).toDF("doc_id", "text")
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (df <- Seq(edge, corpus)) {
      val a = TextAnalytics.repetitionStats(df, "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
      val b = TextAnalytics.repetitionStatsRelational(df, "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
      assert(a.size == b.size)
      a.zip(b).foreach { case (x, y) => assert(x == y, s"row diverges: $x vs $y") }
    }
  }

  test("repetitionStats native path carries no Exchange — the signal is map-only") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = TextAnalytics.repetitionStats(d, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"repetition signal must not shuffle:\n$plan")
  }

  test("null text propagates as null through both native kernels") {
    val df = Seq[Option[String]](None, Some("the and of")).toDF("text")
    val out = df.select(
      textStatsNative(df)(col("text")).as("ts"),
      langSignalsNative(df)(col("text")).as("ls")).collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1))
    assert(!out(1).isNullAt(0) && !out(1).isNullAt(1))
    val r = out(1).getStruct(1)
    assert(r.getLong(r.fieldIndex("stop")) == 3L) // the, and, of
  }

  test("interpreted eval == codegen eval for both kernels") {
    val df = adversarial.toDF("text")
    val cols = Seq(textStatsNative(df)(col("text")).as("ts"),
      langSignalsNative(df)(col("text")).as("ls"))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interpreted = try df.select(cols: _*).collect().toSeq
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    val codegen = df.select(cols: _*).collect().toSeq
    assert(interpreted == codegen)
  }

  test("mojibake repair: classic corruptions, double encoding, undefined cp1252 bytes, safety") {
    import graft.functions.Mojibake
    import org.apache.spark.unsafe.types.UTF8String
    def fix(s: String) = Mojibake.repair(UTF8String.fromString(s)).toString
    def bad(s: String) = Mojibake.corrupt(UTF8String.fromString(s)).toString
    // the two canonical web corruptions
    assert(fix("Thatâ€™s it") == "That’s it")   // â€™ → ’
    assert(fix("cafÃ©") == "café")                        // Ã© → é
    // double-encoded: two repair rounds reach the fixpoint
    assert(fix(bad(bad("It’s 中文"))) == "It’s 中文")
    // round trip over every repairable scripts block
    for (s <- Seq("中文漢字", "привет мир", "مرحبا", "ação é über",
                  "mixed ASCII and 漢字 tail"))
      assert(fix(bad(s)) == s, s"round trip failed for '$s'")
    // the five undefined cp1252 bytes (0x81 8D 8F 90 9D) pass through as
    // C1 controls — corrupt stays bijective, repair still inverts
    val tricky = "edge\u0081case\u2013\u009dx\u00ad"  // undefined-slot C1 controls, en-dash, soft hyphen
    assert(fix(bad(tricky)) == tricky)
    // safety: genuine Latin-1-range prose must NOT be "repaired"
    for (s <- Seq("Â chose île", "café résumé", "naïve Ångström", "A±B"))
      assert(fix(s) == s, s"clean text '$s' must pass through")
    // chars outside the cp1252 image abort the repair wholesale
    assert(fix("Ã©中") == "Ã©中", "unmappable char must veto the repair")
    // ASCII fast path: the input OBJECT comes back (no allocation)
    val ascii = UTF8String.fromString("plain ascii")
    assert(Mojibake.repair(ascii) eq ascii)
    assert(Mojibake.corrupt(ascii) eq ascii)
  }

  test("mojibake property: corrupt→repair is identity on seeded random non-cp1252-image text") {
    import graft.functions.Mojibake
    import org.apache.spark.unsafe.types.UTF8String
    // alphabet deliberately OUTSIDE the cp1252 image (CJK, Cyrillic,
    // Arabic, emoji, ASCII): for such strings the round trip must be an
    // exact inverse — repair(s) itself is the identity (unmappable chars
    // veto), and repair(corrupt(s)) inverts in exactly one round.
    // Strings WITHIN the cp1252 image can be legitimately mojibake-shaped
    // and double-decode (the documented ftfy fixpoint trade), so they are
    // pinned by the literal cases above, not a blanket property.
    val rnd = new scala.util.Random(20260820)
    val atoms = Vector("a", "Z", "9", " ", ".", "中", "漢", "字", "п", "р",
      "и", "م", "ر", "😀", "🤯", "x", "the")
    var checked = 0
    for (_ <- 0 until 500) {
      val s = Vector.fill(rnd.nextInt(40))(atoms(rnd.nextInt(atoms.size))).mkString
      val u = UTF8String.fromString(s)
      assert(Mojibake.repair(u).toString == s, s"repair must be identity on '$s'")
      assert(Mojibake.repair(Mojibake.corrupt(u)).toString == s,
        s"round trip must invert on '$s'")
      checked += 1
    }
    assert(checked == 500)
  }

  test("mojibake expressions: null propagation, SQL registration, interpreted == codegen") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(Some("cafÃ©"), None, Some("ok")).toDF("t")
    val cols = Seq(
      org.apache.spark.sql.functions.expr("graft_fix_mojibake(t)"),
      org.apache.spark.sql.functions.expr("graft_mojibake(t)"))
    val codegen = df.select(cols: _*).collect().toSeq
    assert(codegen(0).getString(0) == "café")
    assert(codegen(1).isNullAt(0) && codegen(1).isNullAt(1))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interpreted = try df.select(cols: _*).collect().toSeq
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(interpreted == codegen)
  }

  test("graft_ldot: parity with the HOF fold; null element and length-mismatch poison to NULL; codegen == interpreted") {
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(5)
    val rows = (0 until 200).map { _ =>
      val n = 1 + rnd.nextInt(8)
      ((0 until n).map(_ => rnd.nextLong() % 100000L),
        (0 until n).map(_ => rnd.nextLong() % 100000L))
    }
    val d = rows.toDF("a", "b")
    val got = d.select(
        call_function("graft_ldot", col("a"), col("b")).as("n"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("h"))
      .collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // length mismatch and null element → NULL, exactly like the HOF
    val edge = Seq(
      (Seq(1L, 2L), Seq(1L, 2L, 3L)),
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L))).toDF("a", "b")
      .union(spark.sql("SELECT array(1L, NULL, 3L) AS a, array(1L, 2L, 3L) AS b"))
    val e = edge.select(
        call_function("graft_ldot", col("a"), col("b")).as("n"),
        expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)").as("h"))
      .collect()
    e.foreach(r => assert(r.isNullAt(0) == r.isNullAt(1) &&
      (r.isNullAt(0) || r.getLong(0) == r.getLong(1))))
    // interpreted matches codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp = try d.select(call_function("graft_ldot", col("a"), col("b")))
      .collect().map(_.getLong(0)).toSeq
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(interp == got.map(_.getLong(0)).toSeq)
  }

  test("graft_ldot: two calls in ONE codegen scope (non-nullable inputs) compile with fallback disabled") {
    // non-nullable array children skip nullSafeExec's brace scope, so a
    // FIXED local name in doGenCode declares twice in the same Java scope
    // — a Janino compile error that silently drops the stage to
    // interpreted execution unless fallback is off (the regression this
    // test pins: the local must come from ctx.freshName)
    graft.functions.GraftFunctions.register(spark)
    val d = Seq((2L, 3L)).toDF("n", "m")
    val a1 = transform(sequence(lit(1L), col("n")), x => x * 2L)
    val a2 = transform(sequence(lit(1L), col("m")), x => x * 2L)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val r = try d.select(
        call_function("graft_ldot", a1, a1).as("x"),
        call_function("graft_ldot", a2, a2).as("y")).collect()(0)
      finally spark.conf.set("spark.sql.codegen.fallback", "true")
    assert(r.getLong(0) == 20L && r.getLong(1) == 56L, s"got $r")
  }

  test("graft_pq_argmin: parity with the join-explode min-struct argmin on random codebooks incl. ties and cid dropouts") {
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    val d = 4
    // non-contiguous cids (Lloyd dropouts) and a deliberate duplicate
    // codeword (cids 7 and 12 identical) so the smallest-cid tie rule is
    // actually exercised
    val sharedCw = Seq.fill(d)(rnd.nextLong() % 1000L)
    val cws: Seq[(Long, Seq[Long])] =
      Seq(0L, 2L, 7L, 12L, 31L).map { cid =>
        cid -> (if (cid == 7L || cid == 12L) sharedCw
                else Seq.fill(d)(rnd.nextLong() % 1000L))
      }
    val flat = cws.sortBy(_._1).flatMap(_._2)
    val cids = cws.map(_._1).sorted
    val vqs = (0 until 300).map(_ => Seq.fill(d)(rnd.nextLong() % 2000L))
    val df = vqs.toDF("vq")
    val got = df.select(call_function("graft_pq_argmin",
        col("vq"), lit(flat.toArray), lit(cids.toArray)).as("cid"))
      .collect().map(_.getLong(0)).toSeq
    // reference: plain integer L2 over the same codewords, min dist then
    // min cid — the semantics the min-struct join form had
    val ref = vqs.map { v =>
      cws.map { case (cid, cw) =>
        (v.zip(cw).map { case (x, c) => (x - c) * (x - c) }.sum, cid)
      }.min._2
    }
    assert(got == ref)
    assert(got.contains(7L) || ref.forall(_ != 12L),
      "tie rule: the duplicate codeword must always resolve to cid 7, never 12")
    assert(!got.contains(12L))
    // malformed shapes and empties → NULL, never a wrong assignment
    val bad = df.limit(1).select(
      call_function("graft_pq_argmin", col("vq"), lit(flat.take(7).toArray), lit(cids.toArray)).as("a"),
      call_function("graft_pq_argmin", col("vq"), lit(flat.toArray), lit(Array.empty[Long])).as("b"))
      .collect()(0)
    assert(bad.isNullAt(0) && bad.isNullAt(1))
  }

  test("graft_sorted_contains: parity with array_contains on a 32768-entry vocab; UTF-8 byte order; nulls; empty array") {
    graft.functions.GraftFunctions.register(spark)
    // vocabulary crossing the UTF-16-vs-UTF-8 ordering trap: U+FFFF sorts
    // ABOVE the surrogate-pair emoji in Java String order but BELOW it in
    // UTF-8 byte order — the probe's contracted sort must place it right
    val tricky = Seq("￿", "😀", "zz", "", "a")
    val vocab = graft.functions.SortedContains.sorted(
      tricky ++ (0 until 32763).map(i => f"tok$i%05d"))
    assert(vocab.length == 32768)
    val vlit = lit(vocab)
    val probes = (tricky ++ Seq("tok00000", "tok32762", "tok32763", "absent",
      "😁", "zzz")).toDF("t")
    val got = probes.select(col("t"),
        call_function("graft_sorted_contains", vlit, col("t")).as("bin"),
        array_contains(vlit, col("t")).as("lin")).collect()
    got.foreach(r => assert(r.getBoolean(1) == r.getBoolean(2),
      s"probe '${r.getString(0)}': binary ${r.getBoolean(1)} vs linear ${r.getBoolean(2)}"))
    assert(got.count(_.getBoolean(1)) == tricky.size + 2)
    // null key / null array → NULL; empty array → false for any key
    val e = spark.sql(
      "SELECT graft_sorted_contains(array('a'), CAST(NULL AS STRING)) AS a, " +
        "graft_sorted_contains(CAST(NULL AS ARRAY<STRING>), 'x') AS b")
      .collect()(0)
    assert(e.isNullAt(0) && e.isNullAt(1))
    val emp = Seq("x").toDF("t")
      .select(call_function("graft_sorted_contains",
        lit(Array.empty[String]), col("t"))).collect()(0)
    assert(!emp.getBoolean(0))
  }
}
