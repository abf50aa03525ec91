package graft

import graft.text.Entropy
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the compressibility signal (rows-only gate — DuckDB has
  * no deflate, so this spec IS the correctness anchor, like the simhash
  * family's parity specs).
  */
class EntropySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("repetitive text compresses far better than prose; gate fires accordingly") {
    val prose = ("the quick brown fox jumps over the lazy dog while seventeen " +
      "violinists argue about parquet footers and watermark semantics ") * 4
    val spam = "buy cheap pills now " * 40
    val dlProse = Entropy.deflatedLength(prose.getBytes("UTF-8"))
    val dlSpam = Entropy.deflatedLength(spam.getBytes("UTF-8"))
    assert(dlProse > 0 && dlSpam > 0)
    // both repeat (prose ×4 compresses too) — but spam compresses much harder
    assert(dlSpam * prose.length < dlProse * spam.length,
      s"spam must be more compressible: spam $dlSpam/${spam.length}, prose $dlProse/${prose.length}")
    assert(Entropy.isLowEntropy(spam.length.toLong, dlSpam),
      "40× repeated phrase must trip the low-entropy gate")
    assert(!Entropy.isLowEntropy(64L, 63L), "near-incompressible text passes")
  }

  test("tiny and empty inputs never trip the gate; empty deflates to 0") {
    assert(Entropy.deflatedLength(Array.emptyByteArray) == 0L)
    assert(Entropy.deflatedLength(null) == 0L)
    assert(!Entropy.isLowEntropy(0L, 0L), "empty doc is not 'low entropy'")
    assert(!Entropy.isLowEntropy(63L, 1L), "below minBytes the gate never fires")
  }

  test("stats: deterministic across parallelism; byte lengths are UTF-8") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rows = (0 until 100).map {
      case i if i % 10 == 0 => (i.toLong, "na " * 80) // low entropy
      case i if i % 7 == 0 => (i.toLong, "héllo wörld ünïcode " + i) // multi-byte UTF-8
      case i => (i.toLong, s"document $i with ordinary mixed content and number ${i * 37}")
    }
    val d = rows.toDF("doc_id", "text")
    def run(parts: Int) = Entropy.stats(d.repartition(parts, col("doc_id")), "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    val a = run(1); val b = run(7)
    assert(a == b, "pure per-row function must be partitioning-invariant")
    assert(a(0L)._3, "repeated filler must gate")
    assert(!a(1L)._3)
    // multi-byte check: char count < byte count for the unicode rows
    val uni = rows.find(_._1 == 7L).get._2
    assert(a(7L)._1 == uni.getBytes("UTF-8").length.toLong && a(7L)._1 > uni.length)
  }
}
