package graft.text

import java.util.zip.Deflater

import org.apache.spark.sql.{DataFrame, Dataset}

/** Compressibility (entropy) signal: how small does DEFLATE make the
  * document? Machine-generated spam, keyword stuffing, and template
  * boilerplate compress far better than prose, which makes the deflate
  * ratio a classic corpus-quality gate (the compression-ratio filters of
  * the C4/Gopher lineage) that catches repetition the token-level
  * repetition stats miss — e.g. long-period repeats beyond the bigram
  * horizon of `t_repetition`.
  *
  * Determinism: raw DEFLATE (no gzip header/timestamp) at a FIXED level
  * over UTF-8 bytes — byte-stable for a given zlib, and
  * partitioning-invariant trivially (pure per-row function). There is NO
  * SQL twin: DuckDB exposes no deflate, so the gate is rows-only
  * (`t_entropy`) with EntropySpec pinning the semantics — same
  * discipline as the xxhash64-based simhash queries.
  *
  * Scale: pure map — one Deflater per row, ended in finally (native zlib
  * memory is off-heap; leaking it under 10^12 rows would OOM executors
  * long before the heap noticed).
  */
object Entropy {

  /** Raw-deflate byte length of `bytes` at BEST_COMPRESSION. Empty input
    * → 0 (the deflate of nothing is a 2-byte trailer we don't charge).
    */
  def deflatedLength(bytes: Array[Byte]): Long = {
    if (bytes == null || bytes.isEmpty) return 0L
    val d = new Deflater(Deflater.BEST_COMPRESSION, /* nowrap = */ true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Low-entropy gate: compressed below `thresholdPct`% of raw size, for
    * documents of at least `minBytes` (tiny docs compress erratically —
    * the header amortization dominates). Integer cross-multiplication,
    * no float division.
    */
  def isLowEntropy(rawLen: Long, deflatedLen: Long,
                   thresholdPct: Long = 30L, minBytes: Long = 64L): Boolean =
    rawLen >= minBytes && deflatedLen * 100L < rawLen * thresholdPct

  /** Per-document stats: (id, raw_bytes, deflated_bytes, low_entropy). */
  def stats(d: DataFrame, idCol: String, textCol: String,
            thresholdPct: Long = 30L, minBytes: Long = 64L): DataFrame = {
    val spark = d.sparkSession
    import spark.implicits._
    val typed: Dataset[(Long, String)] =
      d.selectExpr(s"CAST($idCol AS BIGINT)", textCol).as[(Long, String)]
    typed.mapPartitions(_.map { case (id, text) =>
      val bytes = if (text == null) Array.emptyByteArray
        else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val dl = deflatedLength(bytes)
      (id, bytes.length.toLong, dl, isLowEntropy(bytes.length.toLong, dl, thresholdPct, minBytes))
    }).toDF(idCol, "raw_bytes", "deflated_bytes", "low_entropy")
  }
}
