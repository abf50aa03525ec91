package graft

import graft.dedup.CdcDedup
import graft.functions.{CdcCuts, GraftFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CdcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Naive per-window recompute — the reference the rolling form must
    * match bit-for-bit (and the exact formula the DuckDB oracle replays).
    */
  private def naiveCuts(s: String, w: Int, d: Int): Seq[Int] = {
    val cps = s.codePoints().toArray
    (w to cps.length).filter { i =>
      var h = 0L
      (i - w until i).foreach(j => h = (h * CdcCuts.B + cps(j)) % CdcCuts.M)
      h % d == 0
    }
  }

  private def exprCuts(s: String, w: Int, d: Int): Seq[Int] = {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(s).toDF("t")
      .select(call_function(GraftFunctions.CdcCutsName, col("t"), lit(w), lit(d)))
      .collect()(0).getSeq[Int](0)
  }

  test("rolling hash cuts equal the naive per-window recompute (ASCII + multibyte + emoji)") {
    val rnd = new scala.util.Random(42)
    val alphabets = Seq(
      "abcdefgh ,.!xyz", // ASCII
      "aé漢😀b c",       // 2-, 3-, 4-byte UTF-8 + surrogate pair
      "abc")
    for (alpha <- alphabets; len <- Seq(0, 5, 16, 17, 200, 800)) {
      val cps = alpha.codePoints().toArray
      val s = new String((0 until len).flatMap(_ =>
        Character.toChars(cps(rnd.nextInt(cps.length)))).toArray)
      for ((w, d) <- Seq((16, 64), (4, 8), (2, 2))) {
        assert(exprCuts(s, w, d) == naiveCuts(s, w, d),
          s"w=$w d=$d alpha=$alpha len=$len")
      }
    }
  }

  test("chunks partition the text exactly; short text is one whole chunk; empty drops") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val long = new String((0 until 600).map(_ => ('a' + rnd.nextInt(26)).toChar).toArray)
    val d = Seq((1L, long), (2L, "tiny"), (3L, "")).toDF("doc_id", "text")
    val ch = CdcDedup.chunks(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(!ch.exists(_._1 == 3L), "empty text yields no chunks")
    val tiny = ch.filter(_._1 == 2L)
    assert(tiny.length == 1 && tiny(0)._3 == 1L && tiny(0)._4 == 4L,
      s"text under the window is one whole chunk: ${tiny.toSeq}")
    val one = ch.filter(_._1 == 1L).sortBy(_._2)
    assert(one.length >= 2, "600 chars at divisor 64 must cut at least once")
    // contiguity: each chunk starts where the previous ended
    one.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._3 + a._4, s"gap between ${a} and ${b}")
    }
    assert(one.map(_._4).sum == 600L)
    // reconstruction: md5 of each slice matches an independent recompute
    one.foreach { case (_, _, st, len, h) =>
      val slice = long.substring(st.toInt - 1, st.toInt - 1 + len.toInt)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(slice.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(md == h)
    }
  }

  test("shift robustness: a prefix insertion leaves the tail chunks' hashes intact") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val base = new String((0 until 2000).map(_ => ('a' + rnd.nextInt(26)).toChar).toArray)
    val shifted = "X" + base // the edit fixed-offset chunking cannot absorb
    val d = Seq((1L, base), (2L, shifted)).toDF("doc_id", "text")
    val ch = CdcDedup.chunks(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(4)))
    val h1 = ch.filter(_._1 == 1L).map(_._2).toSet
    val h2 = ch.filter(_._1 == 2L).map(_._2).toSet
    val shared = (h1 & h2).size
    assert(shared >= (h1.size * 3) / 4,
      s"CDC must re-align after the edit: ${h1.size} chunks, only $shared shared")
    // and the shared mass is exactly what sharedChunks reports
    val sc = CdcDedup.sharedChunks(CdcDedup.chunks(d, "doc_id", "text"))
      .collect().map(_.getString(0)).toSet
    assert(sc == (h1 & h2), "sharedChunks catalog == the hash intersection")
  }

  test("versionDelta: unchanged docs fully reuse; a prefix edit keeps most bytes reused") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val long = new String((0 until 2000).map(_ => ('a' + rnd.nextInt(26)).toChar).toArray)
    val v1 = Seq((1L, long), (2L, long)).toDF("doc_id", "text")
    val v2 = Seq((1L, long), (2L, "EDIT " + long)).toDF("doc_id", "text")
    val got = CdcDedup.versionDelta(v1, v2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val (n1, t1, new1, r1) = got(1L)
    assert(n1 == 0L && new1 == 0L && r1 == 1000000L, s"identical version: full reuse: $got")
    assert(t1 == 2000L)
    val (_, _, newCp2, reuse2) = got(2L)
    assert(reuse2 >= 750000L, s"prefix edit must keep most bytes reused (CDC re-aligns): $got")
    assert(newCp2 > 0L, "the edited head really is new")
  }

  test("cut positions are code points, not UTF-16 units or bytes") {
    // 😀 is 1 code point, 2 UTF-16 units, 4 UTF-8 bytes: with w=2 and a
    // divisor accepting everything, cuts must be every code-point index
    val s = "😀😀😀😀"
    assert(exprCuts(s, 2, 2).forall(i => i >= 2 && i <= 4))
    assert(naiveCuts(s, 2, 2) == exprCuts(s, 2, 2))
  }
}
