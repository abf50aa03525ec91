package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.extract.SpanExtractor
import graft.model.{FieldRule, Line}
import org.scalatest.funsuite.AnyFunSuite

class SpanExtractorSpec extends AnyFunSuite {

  private def line(text: String, y: Double = 0) = Line(text, 0, y, 100, y + 10, "TOP-LEFT", text.split(" ").length)

  test("keyword derivation mirrors filter_layout_by_keywords (stopwords, len>2)") {
    val kws = SpanExtractor.keywords(FieldRule("nome_completo", "Nome completo do titular"))
    assert(kws.toSet == Set("nome", "completo", "titular")) // 'do' stopword dropped
    // short tokens (len <= 2) dropped even when not stopwords
    assert(!SpanExtractor.keywords(FieldRule("id", "ID do item XY")).exists(_.length <= 2))
  }

  test("resolution: first matching line wins; value after colon; trimmed") {
    val rules = Seq(FieldRule("nome_completo", "Nome completo do titular"))
    val lines = Seq(line("cabecalho generico", 0), line("Nome: JOÃO DA SILVA ", 20), line("Nome: OUTRO", 40))
    val spans = SpanExtractor.resolve(rules, lines)
    assert(spans.length == 1)
    assert(spans.head.field == "nome_completo")
    assert(spans.head.value == "JOÃO DA SILVA")
    assert(spans.head.y0 == 20)
  }

  test("resolution: no colon → whole line; empty-after-trim → unresolved (P9)") {
    val rules = Seq(FieldRule("registro", "Numero de registro"))
    assert(SpanExtractor.resolve(rules, Seq(line("registro 12345"))).head.value == "registro 12345")
    assert(SpanExtractor.resolve(rules, Seq(line("registro:   "))).isEmpty)
    assert(SpanExtractor.resolve(rules, Seq(line("nothing relevant"))).isEmpty)
  }

  test("resolution: multi-field label line yields tight per-field values") {
    val rules = Seq(
      FieldRule("titulo", "Titulo principal do documento"),
      FieldRule("autor", "Nome do autor do documento"),
      FieldRule("data_emissao", "Data de emissao do documento"),
      FieldRule("numero_registro", "Numero de registro do documento")
    )
    val lines = Seq(
      line("Documento 7", 0),
      line("conteudo principal aqui sem rotulos", 10),
      line("Autor: author-7 Data de emissao: 2024-08-15 Numero de registro: REG-7", 20)
    )
    val byField = SpanExtractor.resolve(rules, lines).map(s => s.field -> s.value).toMap
    assert(byField("autor") == "author-7")
    assert(byField("data_emissao") == "2024-08-15")
    assert(byField("numero_registro") == "REG-7")
    // titulo has no tier-1 match; tier-2 'documento'/'principal' → first line, no colon → whole line
    assert(byField("titulo") == "Documento 7")
  }

  test("resolution: tier-1 (name) keywords beat tier-2 (description) keywords") {
    val rules = Seq(FieldRule("autor", "Nome do autor do documento"))
    val lines = Seq(line("documento generico", 0), line("Autor: Fulano", 20))
    val spans = SpanExtractor.resolve(rules, lines)
    assert(spans.head.value == "Fulano" && spans.head.y0 == 20)
  }

  test("sha256 hex matches Python hashlib") {
    assert(SpanExtractor.sha256Hex("abc".getBytes(UTF_8)) ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(SpanExtractor.sha256Hex(Array.emptyByteArray) ==
      "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855")
  }

  test("schemaHash reproduces Python json.dumps(sort_keys=True, ensure_ascii=False) semantics") {
    // expected values computed with CPython hashlib/json (see Scaladoc P2)
    val rules = Vector(
      FieldRule("titulo", "Titulo principal do documento"),
      FieldRule("autor", "Nome do autor do documento"),
      FieldRule("data_emissao", "Data de emissao do documento"),
      FieldRule("numero_registro", "Numero de registro do documento")
    )
    assert(SpanExtractor.schemaHash(rules) ==
      "2e7381c7ed972a29f3d2408f9551f93a1e404cc301612de9cb5432ffd824203d")
    // order-independence (sort_keys)
    assert(SpanExtractor.schemaHash(rules.reverse) == SpanExtractor.schemaHash(rules))
    // non-ASCII stays raw UTF-8 (ensure_ascii=False)
    val accented = Vector(
      FieldRule("nome_completo", "Nome completo do titular"),
      FieldRule("número", "Número do cartão")
    )
    assert(SpanExtractor.schemaHash(accented) ==
      "a8976b28fd959c22b659d059077ab8aed1d5491c2709e36c1771a37d42711c8c")
  }

  test("cacheKey format matches pipeline.py:47") {
    assert(SpanExtractor.cacheKey("label1", "HASH", "SHASH") == "extract:label1:HASH:SHASH")
  }

  // --- F4: filter_layout_by_keywords, extractor.py:308-384 ---

  test("keyword filter: keeps matching lines, case-insensitive substring") {
    val rules = Vector(FieldRule("nome_completo", "Nome do titular"))
    val layout = "linha com NOME aqui\nsem nada relevante\noutra com titular presente"
    assert(SpanExtractor.filterLayoutByKeywords(layout, rules, 150) ==
      "linha com NOME aqui\noutra com titular presente")
  }

  test("keyword filter: maxLines 0 or empty schema → passthrough") {
    val layout = "a\nb\nc"
    assert(SpanExtractor.filterLayoutByKeywords(layout, Vector(FieldRule("x_yz", "w")), 0) == layout)
    assert(SpanExtractor.filterLayoutByKeywords(layout, Vector.empty, 150) == layout)
  }

  test("keyword filter: no matches → first maxLines fallback; matches truncated to maxLines") {
    val rules = Vector(FieldRule("inscricao", "Numero da inscricao"))
    val layout = (1 to 5).map(i => s"line $i").mkString("\n")
    assert(SpanExtractor.filterLayoutByKeywords(layout, rules, 2) == "line 1\nline 2")
    val matching = (1 to 5).map(i => s"inscricao $i").mkString("\n")
    assert(SpanExtractor.filterLayoutByKeywords(matching, rules, 2) == "inscricao 1\ninscricao 2")
  }

  test("keyword filter: stopword/len>2 keyword derivation (no keywords → first maxLines)") {
    // every token is a stopword or too short → keyword set is empty
    val rules = Vector(FieldRule("de_o_a", "do da em no na"))
    val layout = "x\ny\nz"
    assert(SpanExtractor.filterLayoutByKeywords(layout, rules, 2) == "x\ny")
  }

  // --- G4: resolved/unresolved trace partition (pipeline.py:92-95) ---

  test("kernel emits the unresolved-field complement of spans") {
    import graft.job.ExtractKernel
    import graft.pages.PagesGen
    val schemaHash = SpanExtractor.schemaHash(ExtractKernel.DefaultRules)
    // doc 7 is an HTML doc whose footer line resolves autor/data/registro + h2 titulo
    val row = PagesGen.row(7L, "some body text that is long enough to be content here", "pt")
    val r = ExtractKernel.extract(row, ExtractKernel.DefaultRules, schemaHash)
    assert(r.status == "ok")
    val resolved = r.spans.map(_.field).toSet
    assert((resolved ++ r.unresolved.toSet) == ExtractKernel.DefaultRules.map(_.name).toSet)
    assert(resolved.intersect(r.unresolved.toSet).isEmpty)
    // error rows: everything unresolved
    val bad = PagesGen.row(53L, "whatever", "pt") // empty payload
    val rb = ExtractKernel.extract(bad, ExtractKernel.DefaultRules, schemaHash)
    assert(rb.status == "error")
    assert(rb.unresolved == ExtractKernel.DefaultRules.map(_.name))
  }

  test("compiled-ruleset cache stays bounded under a many-ruleset session") {
    val lines = Seq(line("campo7: valor sete"), line("campo19: valor dezenove"))
    (0 until 20).foreach { i =>
      val rules = Seq(FieldRule(s"campo$i", s"Descricao do campo $i"))
      val spans = SpanExtractor.resolve(rules, lines)
      if (i == 7 || i == 19) assert(spans.map(_.value) == Vector(if (i == 7) "valor sete" else "valor dezenove"))
    }
    assert(SpanExtractor.compiledCacheSize <= 4,
      s"cache grew to ${SpanExtractor.compiledCacheSize} entries across 20 rulesets")
    // an evicted ruleset recompiles and still resolves correctly
    val spans = SpanExtractor.resolve(Seq(FieldRule("campo7", "Descricao do campo 7")), lines)
    assert(spans.map(_.value) == Vector("valor sete"))
  }
}
