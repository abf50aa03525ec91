package graft

import org.scalatest.funsuite.AnyFunSuite

/** Safety net for the grading-driver contract: `entry` smoke, every query
  * executable, oracle keys consistent. A query that throws or an oracle
  * entry without a query would silently zero part of the correctness gate.
  */
class DriverContractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("entry: flagship extraction returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val qk = SparkEntry.queries.keySet
    val ok = SparkEntry.oracleSql.keySet
    assert(ok.subsetOf(qk), s"orphan oracle entries: ${ok.diff(qk)}")
  }

  test("every query executes at sf0.001; oracle-paired ones return rows") {
    // genuine near-dup candidate/pair sets can be empty on a tiny corpus
    // q_decontaminate: the sf0.001 slice may have no ≥33-token doc at the
    // bench stride (doc_id % 101), leaving a legitimately empty overlap
    val mayBeEmpty = Set("d_lsh_pairs", "d_jaccard_pairs", "d_lsh_jaccard",
      "s_embed_neardup_lsh", "q_decontaminate")
    SparkEntry.queries.foreach { case (name, fn) =>
      val rows = fn(spark, sfDir).collect()
      if (SparkEntry.oracleSql.contains(name) && !mayBeEmpty.contains(name))
        assert(rows.nonEmpty, s"$name returned no rows")
    }
  }
}
