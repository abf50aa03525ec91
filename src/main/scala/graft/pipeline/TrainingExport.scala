package graft.pipeline

import graft.dedup.{Decontaminate, Dedup}
import graft.text.{Chunker, Redactor, TextAnalytics}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed "give me training data" call: one operator that takes a raw
  * document table and an eval set and emits trainer-ready chunks —
  *
  *   clean gates → exact dedup → eval-set decontamination → PII redaction
  *   → token-window chunking
  *
  * Each stage is the library operator it names ([[TextAnalytics.isClean]],
  * [[Dedup.dropExactDuplicatesBy]] keyed on the NORMALIZED
  * [[TextAnalytics.fingerprint]] — case/whitespace variants collapse to
  * one survivor, [[Decontaminate.dropContaminated]],
  * [[Redactor.redact]], [[Chunker.chunks]]); this object only fixes their
  * composition order, which IS the semantics a pipeline user relies on:
  * dedup before decontamination (fewer docs to gram-probe), redaction after
  * all content-hash stages (placeholders must not perturb fingerprints or
  * overlap grams), chunking last (chunks inherit the redacted text).
  *
  * Shuffle budget at 10^12 rows — four exchanges total, none carrying
  * documents except the one that must:
  *  1. dedup ships slim (32-hex fp, id) with map-side partial `min`;
  *  2. the survivor semi-join is the one doc-keyed corpus shuffle (needed
  *     to get surviving TEXT back; AQE broadcasts it when the survivor set
  *     is small);
  *  3. decontamination probes a BROADCAST gram set — only matched ids
  *     reach its tiny groupBy, and the flagged-id set broadcast-anti-joins;
  *  4. redaction and chunking are map-only codegen'd projections.
  */
object TrainingExport {

  /** `materialize` (default true) checkpoints the clean and deduped stages
    * (LAZY `localCheckpoint` — no job runs until the result is consumed):
    * dedup consumes its input twice (group + survivor semi-join) and
    * decontamination three more times (corpus grams, flagged-id probe,
    * final anti-join), so without materialization Catalyst re-evaluates
    * the expensive clean filter — lang-ID alone is 16 regexp passes per
    * document — in every branch (measured 29 s vs ~7 s at sf0.1).
    *
    * Trade-off stated plainly: `localCheckpoint` blocks are NOT
    * recomputable after executor loss (lineage is truncated). On a real
    * long-running cluster the equivalent move is writing each stage to a
    * table (or reliable `checkpoint()` with a checkpoint dir) and reading
    * it back — same materialization, durable storage; pass
    * `materialize = false` to keep the pure lazy plan instead.
    */
  def export(docs: DataFrame, idCol: String, textCol: String,
             bench: DataFrame, benchTextCol: String,
             window: Int = 16, stride: Int = 12,
             materialize: Boolean = true): DataFrame = {
    def stage(df: DataFrame): DataFrame =
      if (materialize) df.localCheckpoint(eager = false) else df
    val clean = stage(TextAnalytics.filterClean(docs, textCol))
    // normalized fingerprint key (lower/trim/ws-collapse), matching the
    // q_clean_corpus flagship: "same text modulo case and spacing" is the
    // duplicate policy a training corpus wants
    val deduped = stage(Dedup.dropExactDuplicatesBy(
      clean, idCol, TextAnalytics.fingerprint(col(textCol))))
    val decontaminated =
      Decontaminate.dropContaminated(deduped, idCol, textCol, bench, benchTextCol)
    // the chunker references its text input several times (token count,
    // chunk-count sequence, per-chunk slice/join); unstaged, Catalyst
    // collapses the redaction projection into every one of those
    // references — the three redaction regex chains inline 4+ times and
    // the generated stage passes janino's 64 KB method limit (silent
    // interpreted fallback, caught by PlanSpec's fallback-off gate)
    val redacted = stage(decontaminated
      .select(col(idCol), Redactor.redact(col(textCol)).as(textCol)))
    Chunker.chunks(redacted, idCol, textCol, window, stride)
  }
}
