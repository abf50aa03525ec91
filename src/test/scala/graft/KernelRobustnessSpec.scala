package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp

import graft.extract.SpanExtractor
import graft.html.HtmlTextExtractor
import graft.job.ExtractKernel
import graft.model.PageRow
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** X3 hardening: the kernel must NEVER throw — any input, however
  * malformed, becomes an ok or error ROW (`/root/reference/src/core/batch.py:78-88`).
  * Seeded fuzz over random bytes, truncated valid payloads, and hostile
  * HTML tag soup.
  */
class KernelRobustnessSpec extends AnyFunSuite {
  private val schemaHash = SpanExtractor.schemaHash(ExtractKernel.DefaultRules)

  private def page(bytes: Array[Byte]): PageRow =
    PageRow("https://fuzz.example/x", new Timestamp(0L), bytes, "", "und")

  private def extract(bytes: Array[Byte]) =
    ExtractKernel.extract(page(bytes), ExtractKernel.DefaultRules, schemaHash)

  test("random bytes never throw (2000 seeded samples)") {
    val rnd = new Random(1234)
    (1 to 2000).foreach { i =>
      val n = rnd.nextInt(400)
      val bytes = new Array[Byte](n)
      rnd.nextBytes(bytes)
      val r = extract(bytes)
      assert(r.status == "ok" || r.status == "error", s"sample $i")
      assert(r.pdf_hash.length == 64)
    }
  }

  test("valid payloads truncated at every prefix length never throw") {
    val pdf = graft.pages.PagesGen.payload(3L, "autor: x data de emissao: 2024-01-15 some text here", "pt")
    val html = graft.pages.PagesGen.payload(1L, "some body text long enough to be a paragraph of content", "en")
    Seq(pdf, html).foreach { full =>
      var len = 0
      while (len <= full.length) {
        extract(full.take(len)) // must not throw
        len += math.max(1, full.length / 97)
      }
    }
  }

  test("hostile HTML tag soup: unclosed tags, quoted '>', comments, nested anchors") {
    val cases = Seq(
      "<html><body><p>unclosed paragraph with enough words to count as real content here",
      """<html><body><a href="a>b">quoted gt</a><p>text after a mis-closed attribute quote thing with many words</p>""",
      "<!-- comment never closes <p>hidden",
      "<html><body><a><a><a>triple nested anchors</a> then main content text that is long enough to keep</body>",
      "<p>" + "x" * 100000, // giant single token
      "<script>while(true){<p>fake tags inside script</p>}</script><p>real content after script block with enough words here</p>",
      "<style>p { color: red; }</style><p>the only real paragraph with sufficiently many words to retain</p>",
      "<div>" * 5000 + "deep nesting" + "</div>" * 5000
    )
    cases.foreach { html =>
      HtmlTextExtractor.extract(html) // must not throw
      val r = extract(("<html><body>" + html).getBytes(UTF_8))
      assert(r.status == "ok" || r.status == "error")
    }
    // script/style content never leaks into extracted text
    val r = HtmlTextExtractor.extract(
      "<script>SECRET_JS</script><p>visible words that form a normal content paragraph for keeping</p>")
    assert(!r.contains("SECRET_JS") && r.contains("visible words"))
  }
}
