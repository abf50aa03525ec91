package graft.pdf

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1

/** Deterministic writer for a minimal, spec-conformant PDF subset.
  *
  * Used to synthesize the binary payloads of the pages table (fixtures and
  * benchmark corpus — the sandbox ships no real WARC data). Emits a single
  * page whose content stream positions each word with `Td` and paints it
  * with `Tj` (uncompressed, Type1 Helvetica), i.e. the same glyph-positioning
  * information pdfplumber consumes in the reference
  * (`/root/reference/src/core/extractor.py:74`). Written from scratch against
  * the public PDF 1.4 spec — no PDFBox/reportlab involved.
  */
object MiniPdf {

  final case class PlacedWord(text: String, x: Double, y: Double, fontSize: Double)

  val DefaultPageWidth = 612.0
  val DefaultPageHeight = 792.0

  /** Escape a text string for a PDF literal string, carrying its UTF-8
    * BYTES (re-read as Latin-1 chars so the final
    * `getBytes(ISO_8859_1)` emits them verbatim): Latin-1 covers only
    * U+00FF — CJK/emoji text would otherwise collapse to '?'. Pure-ASCII
    * text is byte-identical either way, so the frozen golden payloads are
    * unaffected. [[PdfLayoutParser]] decodes the bytes back as UTF-8.
    */
  private def esc(s: String): String =
    new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), ISO_8859_1).flatMap {
      case '\\' => "\\\\"
      case '('  => "\\("
      case ')'  => "\\)"
      case c    => c.toString
    }

  /** Format a coordinate the way we also parse it back: minimal decimal. */
  private def num(d: Double): String =
    if (d == d.floor && math.abs(d) < 1e15) d.toLong.toString
    else BigDecimal(d).bigDecimal.stripTrailingZeros.toPlainString

  /** Build single-page PDF bytes. `words` carry PDF-space coordinates
    * (origin bottom-left, y grows UP — conversion to top-down reader space
    * happens in [[PdfLayoutParser]]).
    */
  def build(
      words: Seq[PlacedWord],
      pageWidth: Double = DefaultPageWidth,
      pageHeight: Double = DefaultPageHeight
  ): Array[Byte] = {
    val content = new StringBuilder
    words.foreach { w =>
      content
        .append("BT /F1 ").append(num(w.fontSize)).append(" Tf ")
        .append(num(w.x)).append(' ').append(num(w.y)).append(" Td (")
        .append(esc(w.text)).append(") Tj ET\n")
    }
    val contentBytes = content.toString.getBytes(ISO_8859_1)

    val out = new ByteArrayOutputStream(contentBytes.length + 1024)
    val offsets = new Array[Int](6)
    def write(s: String): Unit = out.write(s.getBytes(ISO_8859_1))

    write("%PDF-1.4\n")
    offsets(1) = out.size()
    write("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    offsets(2) = out.size()
    write("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    offsets(3) = out.size()
    write(
      s"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 ${num(pageWidth)} ${num(pageHeight)}]" +
        " /Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >> endobj\n"
    )
    offsets(4) = out.size()
    write(s"4 0 obj << /Length ${contentBytes.length} >> stream\n")
    out.write(contentBytes, 0, contentBytes.length)
    write("\nendstream endobj\n")
    offsets(5) = out.size()
    write("5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n")
    val xref = out.size()
    write("xref\n0 6\n0000000000 65535 f \n")
    (1 to 5).foreach(i => write(f"${offsets(i)}%010d 00000 n \n"))
    write(s"trailer << /Size 6 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  /** A structurally valid PDF with zero pages — exercises the reference's
    * "Empty PDF: no pages found" error path
    * (`/root/reference/src/core/extractor.py:66-67`).
    */
  def buildEmpty(): Array[Byte] =
    "%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n2 0 obj << /Type /Pages /Kids [] /Count 0 >> endobj\ntrailer << /Size 3 /Root 1 0 R >>\n%%EOF\n"
      .getBytes(ISO_8859_1)
}
