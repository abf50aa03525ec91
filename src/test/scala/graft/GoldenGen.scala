package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import graft.job.ExtractKernel
import graft.extract.SpanExtractor
import graft.pages.PagesGen

/** One-shot generator for the frozen golden set (run manually via
  * `sbt "Test/runMain graft.GoldenGen"`, output checked into
  * src/test/resources/goldens and reviewed by hand). The goldens are the
  * byte-identity contract: once frozen, any kernel change that alters a
  * single output byte fails GoldenSpec.
  */
object GoldenGen {
  val DocIds: Range = 0 until 60 // covers pdf (%3), corrupt (41), empty payload (53 via %53)

  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang").as[(Long, String, String)]
      .filter(d => DocIds.contains(d._1.toInt)).collect().sortBy(_._1)
    val outDir = Paths.get("src/test/resources/goldens")
    Files.createDirectories(outDir)
    val schemaHash = SpanExtractor.schemaHash(ExtractKernel.DefaultRules)
    val manifest = new StringBuilder
    docs.foreach { case (id, text, lang) =>
      val row = PagesGen.row(id, Option(text).getOrElse(""), Option(lang).getOrElse("und"))
      val r = ExtractKernel.extract(row, ExtractKernel.DefaultRules, schemaHash)
      if (r.status == "ok")
        Files.write(outDir.resolve(s"doc_$id.txt"), r.extracted_text.getBytes(UTF_8))
      val spans = r.spans.map(s => s"${s.field}=${s.value}").mkString("|")
      manifest.append(
        s"$id\t${r.url}\t${r.status}\t${r.doctype}\t${r.pdf_hash}\t${Option(r.error).getOrElse("")}\t$spans\n")
    }
    Files.write(outDir.resolve("manifest.tsv"), manifest.toString.getBytes(UTF_8))
    println(s"wrote ${docs.length} goldens to $outDir")
    spark.stop()
  }
}
