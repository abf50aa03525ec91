package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import graft.extract.SpanExtractor
import graft.job.ExtractKernel
import graft.pages.PagesGen
import org.scalatest.funsuite.AnyFunSuite

/** Hand-picked non-ASCII corpus for the SECOND frozen golden set: the main
  * goldens (0-59) are Latin-1-safe, but SURVEY §7.4 names NFC/UTF-8 as a
  * hard part of byte-identity — this corpus exercises it: accented
  * Portuguese/German (2-byte UTF-8), CJK (3-byte), emoji (4-byte,
  * surrogate pairs in Java strings), and an NFD-decomposed string
  * (combining diacritic) that must pass through VERBATIM — the kernel
  * must not silently normalize.
  *
  * Ids are chosen to route through PagesGen's payload branches:
  * %3==0 → PDF, else HTML (none hit the corrupt/empty branches).
  */
object UnicodeCorpus {
  // NFD "João": 'a' + combining tilde U+0303 — byte-distinct from the NFC
  // form even though it renders identically
  val NfdJoao: String = "Jo" + "a" + "\u0303" + "o"

  val docs: Seq[(Long, String, String)] = Seq(
    // HTML branch (id % 3 != 0)
    (61L, "João emitiu o relatório número 7. A ação começa amanhã çedo. O código está pronto.", "pt"),
    (62L, "Müller wohnt in der Straße größer als üblich. Die Übung war schön und vollständig heute.", "de"),
    (65L, "数据 处理 系统 支持 中文 文本。 系统 在 大规模 数据 上 运行。 提取 结果 保持 一致。", "zh"),
    (67L, s"$NfdJoao submitted the report. 🚀 The data 🌍 pipeline handles emoji and NFD text fine.", "en"),
    // PDF branch (id % 3 == 0)
    (63L, "Relatório técnico número três. Joãoça Müller 数据 mixed content across scripts here.", "pt"),
    (66L, "Ségundo documento em português com acentuação: é, à, ç, õ, ü. Mais conteúdo segue aqui.", "pt")
  )
}

/** One-shot generator (run via `sbt "Test/runMain graft.UnicodeGoldenGen"`,
  * output reviewed and checked into src/test/resources/goldens_unicode).
  */
object UnicodeGoldenGen {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get("src/test/resources/goldens_unicode")
    Files.createDirectories(outDir)
    val schemaHash = SpanExtractor.schemaHash(ExtractKernel.DefaultRules)
    val manifest = new StringBuilder
    UnicodeCorpus.docs.foreach { case (id, text, lang) =>
      val r = ExtractKernel.extract(PagesGen.row(id, text, lang), ExtractKernel.DefaultRules, schemaHash)
      require(r.status == "ok", s"doc $id must extract cleanly, got ${r.error}")
      Files.write(outDir.resolve(s"doc_$id.txt"), r.extracted_text.getBytes(UTF_8))
      val spans = r.spans.map(s => s"${s.field}=${s.value}").mkString("|")
      manifest.append(s"$id\t${r.url}\t${r.status}\t${r.doctype}\t${r.pdf_hash}\t$spans\n")
    }
    Files.write(outDir.resolve("manifest.tsv"), manifest.toString.getBytes(UTF_8))
    println(s"wrote ${UnicodeCorpus.docs.length} unicode goldens to $outDir")
  }
}

/** Byte-identity of the kernel on the frozen NON-ASCII corpus: same
  * contract as GoldenSpec, plus explicit no-normalization assertions.
  */
class UnicodeGoldenSpec extends AnyFunSuite {
  private val goldenDir = Paths.get("src/test/resources/goldens_unicode")
  private val schemaHash = SpanExtractor.schemaHash(ExtractKernel.DefaultRules)

  test("extracted_text is byte-identical to the frozen golden (accents, CJK, emoji, NFD)") {
    val manifest = new String(Files.readAllBytes(goldenDir.resolve("manifest.tsv")), UTF_8)
      .split("\n").filter(_.nonEmpty).map { l =>
        val f = l.split("\t", -1); (f(0).toLong, f(1), f(2), f(3), f(4), f(5))
      }
    assert(manifest.length == UnicodeCorpus.docs.length)
    val byId = UnicodeCorpus.docs.map(d => d._1 -> d).toMap
    manifest.foreach { case (id, url, status, doctype, pdfHash, spans) =>
      val (_, text, lang) = byId(id)
      val r = ExtractKernel.extract(PagesGen.row(id, text, lang), ExtractKernel.DefaultRules, schemaHash)
      assert(r.url == url && r.status == status && r.doctype == doctype, s"doc $id identity")
      assert(r.pdf_hash == pdfHash, s"doc $id payload hash (generator changed?)")
      assert(r.spans.map(s => s"${s.field}=${s.value}").mkString("|") == spans, s"doc $id spans")
      val golden = Files.readAllBytes(goldenDir.resolve(s"doc_$id.txt"))
      assert(java.util.Arrays.equals(r.extracted_text.getBytes(UTF_8), golden),
        s"doc $id extracted_text bytes diverge (got: ${r.extracted_text.take(120)})")
    }
  }

  test("both payload branches are covered and NFD passes through un-normalized") {
    val byDoctype = UnicodeCorpus.docs.groupBy(_._1 % 3 == 0)
    assert(byDoctype.keySet == Set(true, false)) // pdf + html branches
    // the NFD doc: the combining tilde must survive extraction verbatim —
    // a kernel that silently NFC-normalizes would emit the 2-byte ã here
    val (id, text, lang) = UnicodeCorpus.docs.find(_._2.contains(UnicodeCorpus.NfdJoao)).get
    val r = ExtractKernel.extract(PagesGen.row(id, text, lang), ExtractKernel.DefaultRules, schemaHash)
    assert(r.status == "ok")
    assert(r.extracted_text.contains(UnicodeCorpus.NfdJoao), "NFD sequence must pass through")
    assert(!r.extracted_text.contains("Jo" + "\u00e3" + "o"), "NFC form must NOT appear (no silent normalization)")
    // emoji (4-byte UTF-8 / surrogate pair) survives too
    assert(r.extracted_text.contains("🚀"))
  }
}
