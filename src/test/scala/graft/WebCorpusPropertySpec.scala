package graft

import graft.text.{Chunker, Redactor}
import graft.web.UrlOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Seeded randomized properties for the web-corpus operators. The key
  * invariants are the ones a 100-TB pipeline silently depends on:
  * canonicalization and redaction are IDEMPOTENT (re-running an
  * incremental pass over already-processed rows is a no-op), and chunking
  * covers every token with the documented overlap (a trainer sees the
  * whole document, exactly once per window position).
  */
class WebCorpusPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val rnd = new Random(7)

  private def randUrl(): String = {
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.size))
    val scheme = pick(Seq("http", "HTTP", "https", "HTTPS", "HttpS"))
    val host = pick(Seq("WWW.Site", "cdn.site", "A.b.C.site")) + rnd.nextInt(20) +
      pick(Seq(".COM", ".org", ".Net"))
    val port = pick(Seq("", ":80", ":443", ":8080"))
    val path = pick(Seq("", "/", "/A/b", "/Docs/Page" + rnd.nextInt(50)))
    val query = pick(Seq("", "?a=1", "?utm_source=x", "?a=1&utm_medium=y&b=2",
      "?gclid=1&fbclid=2", "?z=9&gclid=abc"))
    val frag = pick(Seq("", "#f", "#Sec-2"))
    s"$scheme://$host$port$path$query$frag"
  }

  test("canonicalize is idempotent on arbitrary messy urls") {
    import spark.implicits._
    val urls = Vector.fill(300)(randUrl())
    val rows = urls.toDF("url")
      .select(UrlOps.canonicalize(col("url")).as("c1"))
      .select(col("c1"), UrlOps.canonicalize(col("c1")).as("c2"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"not idempotent: ${r.getString(0)} -> ${r.getString(1)}"))
  }

  test("canonicalize output never carries fragments, tracking params, or default ports") {
    import spark.implicits._
    val urls = Vector.fill(300)(randUrl())
    val cs = urls.toDF("url")
      .select(UrlOps.canonicalize(col("url")).as("c")).collect().map(_.getString(0))
    cs.foreach { c =>
      assert(!c.contains("#"), c)
      assert(!c.contains("utm_") && !c.contains("gclid=") && !c.contains("fbclid="), c)
      assert(!(c.startsWith("https://") && c.split("/", 4)(2).endsWith(":443")), c)
      assert(!(c.startsWith("http://") && c.split("/", 4)(2).endsWith(":80")), c)
    }
  }

  private def randPiiText(): String = {
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.size))
    Vector.fill(3 + rnd.nextInt(15))(pick(Seq(
      "word", "text", "the", "a1.2", "+12", "mail",
      s"user${rnd.nextInt(100)}@host${rnd.nextInt(9)}.example.com",
      s"10.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}",
      s"+49${100000000 + rnd.nextInt(900000000)}"))).mkString(" ")
  }

  test("redact is idempotent (placeholders never re-match)") {
    import spark.implicits._
    val rows = Vector.fill(200)(randPiiText()).toDF("t")
      .select(Redactor.redact(col("t")).as("r1"))
      .select(col("r1"), Redactor.redact(col("r1")).as("r2"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("chunks reconstruct the document: stride-offset concatenation is lossless") {
    import spark.implicits._
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val docs = (0L until 50L)
      .map(i => i -> Vector.fill(1 + rnd.nextInt(60))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val (w, s) = (16, 12)
    val byDoc = Chunker.chunks(docs.toDF("doc_id", "text"), "doc_id", "text", w, s)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
    docs.foreach { case (id, text) =>
      val toks = text.trim.split("\\s+").toVector
      val chunks = byDoc(id).sortBy(_._2)
      // chunk count matches the documented formula
      val expectN = if (toks.size <= w) 1 else 1 + math.ceil((toks.size - w) / s.toDouble).toInt
      assert(chunks.length == expectN, s"doc $id: ${chunks.length} vs $expectN")
      chunks.foreach { case (_, cid, nTok, ctext) =>
        val expect = toks.slice(cid.toInt * s, cid.toInt * s + w)
        assert(ctext == expect.mkString(" "), s"doc $id chunk $cid")
        assert(nTok == expect.size)
      }
      // first `s` tokens of each chunk, plus the tail of the last chunk,
      // reconstruct the document exactly
      val rebuilt = chunks.flatMap(c => c._4.split(" ").take(s)) ++
        chunks.last._4.split(" ").drop(s)
      assert(rebuilt.toVector == toks, s"doc $id reconstruction")
    }
  }
}
