package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-window chunking: split each document into overlapping windows of
  * `window` whitespace tokens advancing by `stride` — the standard
  * sequence-packing preprocessing step between a cleaned corpus and a
  * trainer whose context length is fixed (HF `return_overflowing_tokens`
  * semantics: every token is covered, the final window may be short).
  *
  * Chunk policy (deterministic, engine-portable):
  *  - `n ≤ window` → one chunk (the whole document);
  *  - otherwise `1 + ceil((n - window) / stride)` chunks, chunk `i`
  *    covering tokens `[i·stride, i·stride + window)` 0-indexed; the last
  *    chunk is truncated at the document end (never shorter than
  *    `window - stride` tokens).
  *
  * Shape for 10^12 rows: one projection computes the token array, a
  * `posexplode(sequence(...))`-style fan-out emits chunk ids, and `slice` +
  * `array_join` materialize each window — all codegen'd collection
  * expressions evaluated row-locally. No shuffle at all: chunking is a
  * map-only operator, and the output carries `(doc_id, chunk_id)` so any
  * downstream repartition can key on it.
  *
  * Empty/blank documents produce no chunks (there is nothing to pack).
  */
object Chunker {

  def chunks(df: DataFrame, idCol: String, textCol: String,
             window: Int = 16, stride: Int = 12): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = split(trim(col(textCol)), "\\s+")
    val base = df
      .where(length(trim(col(textCol))) > 0)
      .select(col(idCol), toks.as("tk"), size(toks).cast("long").as("n"))
    // integer chunk count: 1 + ceil((n - window)/stride) without float
    // division — (n - window + stride - 1) div stride via floor() on an
    // exact small-integer quotient (IEEE division of exact ints < 2^52
    // cannot cross an integer boundary)
    val nChunks = when(col("n") <= window, lit(1L))
      .otherwise(lit(1L) + floor((col("n") - window + (stride - 1)) / lit(stride)).cast("long"))
    base
      .select(col(idCol), col("tk"), col("n"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_id"))
      .select(
        col(idCol),
        col("chunk_id"),
        least(lit(window.toLong), col("n") - col("chunk_id") * stride).as("n_chunk_tokens"),
        array_join(
          slice(col("tk"), (col("chunk_id") * stride + 1).cast("int"), lit(window)),
          " ").as("chunk_text"))
  }
}
