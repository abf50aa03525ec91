package graft.pdf

import java.nio.charset.StandardCharsets.ISO_8859_1

import graft.layout.ZoneGrid
import graft.model.Word

import scala.collection.mutable.ArrayBuffer

/** From-scratch parser for the PDF subset this engine processes:
  * uncompressed content streams with `Tf`/`Td`/`TD`/`Tj`/`TJ` text operators
  * inside `BT`…`ET` blocks. Replaces the reference's pdfplumber call
  * (`/root/reference/src/core/extractor.py:65-95`) with deterministic
  * pure-Scala glyph positioning:
  *
  *  - PDF space (origin bottom-left, y up) is converted to reader space
  *    (origin top-left, y down), matching pdfplumber's `top`/`bottom`:
  *    `top = pageHeight − yPdf − fontSize`, `bottom = top + fontSize`.
  *  - Word width is metric-approximated as `0.6 × fontSize × textLength`
  *    (Helvetica average advance) — deterministic, documented, and the
  *    golden set is frozen against exactly these semantics.
  *
  * Malformed input throws [[PdfParseException]]; the kernel converts that to
  * an error ROW, never a task failure (X3 in SURVEY §2.6).
  */
final class PdfParseException(msg: String) extends Exception(msg)

object PdfLayoutParser {

  final case class ParsedPage(words: Vector[Word], pageWidth: Double, pageHeight: Double)

  val CharWidthRatio = 0.6

  def parse(bytes: Array[Byte]): ParsedPage = {
    val s = new String(bytes, ISO_8859_1)
    if (!s.startsWith("%PDF-")) throw new PdfParseException("not a PDF: missing %PDF- header")
    if (s.contains("/Count 0")) throw new PdfParseException("Empty PDF: no pages found")

    val (pw, ph) = mediaBox(s)

    val streamStart = s.indexOf("stream")
    if (streamStart < 0) throw new PdfParseException("malformed PDF: no content stream")
    var contentFrom = streamStart + "stream".length
    if (contentFrom < s.length && s.charAt(contentFrom) == '\r') contentFrom += 1
    if (contentFrom < s.length && s.charAt(contentFrom) == '\n') contentFrom += 1
    val streamEnd = s.indexOf("endstream", contentFrom)
    if (streamEnd < 0) throw new PdfParseException("malformed PDF: unterminated stream")
    val content = s.substring(contentFrom, streamEnd)

    val words = tokenizeAndRun(content, pw, ph)
    if (words.isEmpty) throw new PdfParseException("Empty PDF: no text content")
    ParsedPage(words.toVector, pw, ph)
  }

  /** PDF string bytes → text. The whole document is scanned Latin-1
    * (byte-transparent); string content that is STRICTLY valid UTF-8 is
    * decoded as UTF-8 (the MiniPdf writer emits UTF-8 bytes — CJK/emoji
    * round-trip), anything else keeps its Latin-1 reading (a real-world
    * Latin-1 PDF string must not be mangled by a forced UTF-8 decode).
    * ASCII fast path: no allocation for the overwhelmingly common case.
    */
  private def decodeText(raw: String): String = {
    var ascii = true
    var j = 0
    while (ascii && j < raw.length) { if (raw.charAt(j) >= 0x80) ascii = false else j += 1 }
    if (ascii) return raw
    val bytes = raw.getBytes(ISO_8859_1)
    try {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    } catch { case _: java.nio.charset.CharacterCodingException => raw }
  }

  private def mediaBox(s: String): (Double, Double) = {
    val i = s.indexOf("/MediaBox")
    if (i < 0) return (MiniPdf.DefaultPageWidth, MiniPdf.DefaultPageHeight)
    val open = s.indexOf('[', i)
    val close = s.indexOf(']', open)
    if (open < 0 || close < 0) return (MiniPdf.DefaultPageWidth, MiniPdf.DefaultPageHeight)
    val nums = s.substring(open + 1, close).trim.split("\\s+").map(_.toDouble)
    if (nums.length == 4) (nums(2) - nums(0), nums(3) - nums(1))
    else (MiniPdf.DefaultPageWidth, MiniPdf.DefaultPageHeight)
  }

  /** Run the text operators; emit one positioned [[Word]] per shown string
    * (zone computed inline — an intermediate tuple would box four doubles
    * per word before the Word allocation, doubling per-word garbage).
    */
  private def tokenizeAndRun(content: String, pageWidth: Double, pageHeight: Double): ArrayBuffer[Word] = {
    val out = ArrayBuffer.empty[Word]
    var i = 0
    val n = content.length
    var fontSize = 12.0
    var tx = 0.0
    var ty = 0.0
    // operand state: every operator in this subset reads at most the LAST
    // TWO numbers, so two vars + a count replace an operand stack (the
    // ArrayBuffer clear per operator was 4% of kernel samples)
    var numPrev = 0.0
    var numLast = 0.0
    var numCount = 0
    def pushNum(v: Double): Unit = { numPrev = numLast; numLast = v; numCount += 1 }
    def clearNums(): Unit = numCount = 0
    var lastString: String = null
    var leading = 0.0

    def emit(raw: String): Unit = {
      val text = decodeText(raw)
      val x0 = tx
      val top = pageHeight - ty - fontSize
      val x1 = x0 + CharWidthRatio * fontSize * text.length
      val bottom = top + fontSize
      out += Word(text, x0, top, x1, bottom, ZoneGrid.zone(x0, top, x1, bottom, pageWidth, pageHeight))
    }

    while (i < n) {
      val c = content.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') {
        val sb = new StringBuilder
        i += 1
        var done = false
        while (i < n && !done) {
          val ch = content.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            content.charAt(i + 1) match {
              case '\\' => sb.append('\\'); i += 2
              case '('  => sb.append('('); i += 2
              case ')'  => sb.append(')'); i += 2
              case 'n'  => sb.append('\n'); i += 2
              case 'r'  => sb.append('\r'); i += 2
              case 't'  => sb.append('\t'); i += 2
              case other => sb.append(other); i += 2
            }
          } else if (ch == ')') { done = true; i += 1 }
          else { sb.append(ch); i += 1 }
        }
        lastString = sb.toString
      } else if (c == '[' || c == ']') {
        i += 1 // TJ arrays: strings concatenate, kerning numbers ignored for bbox
      } else if (c == '/') {
        i += 1
        while (i < n && !content.charAt(i).isWhitespace) i += 1 // name token (font)
      } else if (c == '-' || c == '.' || c.isDigit) {
        val start = i
        i += 1
        while (i < n && (content.charAt(i).isDigit || content.charAt(i) == '.')) i += 1
        pushNum(content.substring(start, i).toDouble)
      } else {
        val start = i
        while (i < n && !content.charAt(i).isWhitespace && !"()[]/".contains(content.charAt(i))) i += 1
        val op = content.substring(start, i)
        op match {
          case "BT" => tx = 0.0; ty = 0.0; clearNums()
          case "ET" => clearNums()
          case "Tf" => if (numCount >= 1) fontSize = numLast; clearNums()
          case "Td" =>
            if (numCount >= 2) { tx += numPrev; ty += numLast }
            clearNums()
          case "TD" =>
            if (numCount >= 2) { tx += numPrev; ty += numLast; leading = -numLast }
            clearNums()
          case "TL" => if (numCount >= 1) leading = numLast; clearNums()
          case "T*" => ty -= leading; clearNums()
          case "Tj" => if (lastString != null) { emit(lastString); lastString = null }; clearNums()
          case "TJ" => if (lastString != null) { emit(lastString); lastString = null }; clearNums()
          case _    => clearNums() // unknown operator: operands dropped
        }
      }
    }
    out
  }
}
