package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import graft.extract.SpanExtractor
import graft.job.ExtractKernel
import graft.pages.PagesGen
import org.scalatest.funsuite.AnyFunSuite

/** Byte-identity against the frozen golden set (SURVEY §5.2(2)) — the
  * north_rule's per-row invariant. The goldens under
  * src/test/resources/goldens were generated once by [[GoldenGen]], reviewed,
  * and checked in; regenerating them to make this test pass defeats its
  * purpose.
  */
class GoldenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val goldenDir = Paths.get("src/test/resources/goldens")

  test("extracted_text is byte-identical to the frozen golden per url (60 docs, all branches)") {
    import spark.implicits._
    val manifest = new String(Files.readAllBytes(goldenDir.resolve("manifest.tsv")), UTF_8)
      .split("\n").filter(_.nonEmpty).map { l =>
        val f = l.split("\t", -1); (f(0).toLong, f(1), f(2), f(3), f(4), f(5), f(6))
      }
    assert(manifest.length == 60)

    val ids = manifest.map(_._1).toSet
    val schemaHash = SpanExtractor.schemaHash(ExtractKernel.DefaultRules)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang").as[(Long, String, String)]
      .filter(d => ids.contains(d._1)).collect().map(d => d._1 -> d).toMap

    manifest.foreach { case (id, url, status, doctype, pdfHash, error, spans) =>
      val (_, text, lang) = docs(id)
      val row = PagesGen.row(id, Option(text).getOrElse(""), Option(lang).getOrElse("und"))
      val r = ExtractKernel.extract(row, ExtractKernel.DefaultRules, schemaHash)
      assert(r.url == url, s"doc $id url")
      assert(r.status == status, s"doc $id status")
      assert(r.doctype == doctype, s"doc $id doctype")
      assert(r.pdf_hash == pdfHash, s"doc $id payload hash (generator changed?)")
      assert(Option(r.error).getOrElse("") == error, s"doc $id error")
      assert(r.spans.map(s => s"${s.field}=${s.value}").mkString("|") == spans, s"doc $id spans")
      if (status == "ok") {
        val golden = Files.readAllBytes(goldenDir.resolve(s"doc_$id.txt"))
        val actual = r.extracted_text.getBytes(UTF_8)
        assert(
          java.util.Arrays.equals(actual, golden),
          s"doc $id extracted_text bytes diverge from golden (first 120 chars: ${r.extracted_text.take(120)})"
        )
      }
    }
  }

  test("golden corpus covers every kernel branch") {
    val manifest = new String(Files.readAllBytes(goldenDir.resolve("manifest.tsv")), UTF_8)
      .split("\n").filter(_.nonEmpty).map(_.split("\t", -1))
    val combos = manifest.map(f => (f(2), f(3))).toSet
    assert(combos.contains(("ok", "pdf")))
    assert(combos.contains(("ok", "html")))
    assert(combos.contains(("error", "pdf")))     // corrupt payload
    assert(combos.contains(("error", "unknown"))) // empty payload
  }
}
