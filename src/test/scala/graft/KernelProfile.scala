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

    // ---- sampling profiler: run the kernel hot for ~5 s, sample the
    // worker's stack every ~2 ms, histogram the deepest graft frame ----
    @volatile var running = true
    val worker = new Thread(() => {
      while (running) rows.foreach(r => ExtractKernel.extract(r, rules, schemaHash))
    })
    worker.setDaemon(true)
    val hist = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    worker.start()
    Thread.sleep(300) // warm
    val until = System.nanoTime() + 5000000000L
    while (System.nanoTime() < until) {
      val st = worker.getStackTrace
      val frame = st.find(f => f.getClassName.startsWith("graft.") || f.getClassName.startsWith("scala.collection"))
        .map(f => s"${f.getClassName.split('.').last}.${f.getMethodName}")
        .getOrElse(st.headOption.map(f => s"${f.getClassName.split('.').last}.${f.getMethodName}").getOrElse("?"))
      hist(frame) += 1
      Thread.sleep(2)
    }
    running = false
    val total = hist.values.sum.max(1)
    println(s"\n-- stack samples ($total) --")
    hist.toSeq.sortBy(-_._2).take(20).foreach { case (f, n) =>
      println(f"${100.0 * n / total}%6.1f%%  $f")
    }
    spark.stop()
  }
}
