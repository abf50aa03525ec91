package graft

import graft.extract.SpanExtractor
import graft.html.HtmlTextExtractor
import graft.job.ExtractKernel
import graft.layout.{LayoutFormatter, LineClusterer, TableDetector}
import graft.pages.PagesGen
import graft.pdf.PdfLayoutParser

import java.nio.charset.StandardCharsets.UTF_8

/** Single-threaded kernel stage profiler (dev tool, test scope):
  * `sbt "Test/runMain graft.KernelProfile"`. Times each kernel stage over
  * the synthesized sf0.001 corpus to direct optimization effort.
  */
object KernelProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang").as[(Long, String, String)].collect()
    val rows = docs.map { case (id, t, l) => PagesGen.row(id, Option(t).getOrElse(""), Option(l).getOrElse("und")) }
    val schemaHash = SpanExtractor.schemaHash(ExtractKernel.DefaultRules)
    val rules = ExtractKernel.DefaultRules

    def time[A](label: String, reps: Int)(f: => A): Unit = {
      f; f // warm
      val t0 = System.nanoTime()
      var i = 0
      while (i < reps) { f; i += 1 }
      val per = (System.nanoTime() - t0) / 1e3 / reps
      println(f"$label%-28s ${per / rows.length}%10.2f us/doc  (${per / 1000}%8.1f ms/pass)")
    }

    val pdfRows = rows.filter(r => r.html.nonEmpty && r.html(0) == '%')
    val htmlRows = rows.filter(r => r.html.nonEmpty && r.html(0) == '<')
    println(s"docs=${rows.length} pdf=${pdfRows.length} html=${htmlRows.length}")

    time("full kernel", 20) { rows.foreach(r => ExtractKernel.extract(r, rules, schemaHash)) }
    time("kernel pdf-only", 20) { pdfRows.foreach(r => ExtractKernel.extract(r, rules, schemaHash)) }
    time("kernel html-only", 20) { htmlRows.foreach(r => ExtractKernel.extract(r, rules, schemaHash)) }
    val htmlBlocks = htmlRows.map(r => HtmlTextExtractor.contentBlocks(new String(r.html, UTF_8)))
    val htmlPseudo = htmlBlocks.map { bs =>
      var off = 0
      bs.zipWithIndex.map { case (b, i) =>
        val s = off; off += b.text.length + 1
        graft.model.Line(b.text, s.toDouble, i.toDouble, (s + b.text.length).toDouble, i.toDouble, "NONE", b.words)
      }
    }
    time("span resolve (html lines)", 20) { htmlPseudo.foreach(ls => SpanExtractor.resolve(rules, ls)) }
    time("sniff", 20) { rows.foreach(r => graft.sniff.ContentSniffer.sniff(r.html)) }
    time("sha256(payload)", 20) { rows.foreach(r => SpanExtractor.sha256Hex(r.html)) }
    val parsedPdf = pdfRows.map(r => scala.util.Try(PdfLayoutParser.parse(r.html)).toOption).flatten
    time("pdf parse", 20) { pdfRows.foreach(r => scala.util.Try(PdfLayoutParser.parse(r.html))) }
    time("pdf cluster+format", 20) {
      parsedPdf.foreach { p =>
        val groups = LineClusterer.clusterGroups(p.words)
        val lines = groups.map(LineClusterer.assemble)
        LayoutFormatter.format(lines)
        TableDetector.detect(groups)
      }
    }
    val htmlStrs = htmlRows.map(r => new String(r.html, UTF_8))
    time("html decode(bytes→str)", 20) { htmlRows.foreach(r => new String(r.html, UTF_8)) }
    time("html contentBlocks", 20) { htmlStrs.foreach(HtmlTextExtractor.contentBlocks) }
    val pdfLines = parsedPdf.map(p => LineClusterer.clusterGroups(p.words).map(LineClusterer.assemble))
    time("span resolve (pdf lines)", 20) { pdfLines.foreach(ls => SpanExtractor.resolve(rules, ls)) }
    spark.stop()
  }
}
