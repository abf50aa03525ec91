package graft

import graft.sample.Sampler
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("bucket10k: engine-portable md5 buckets (values pinned against DuckDB)") {
    import spark.implicits._
    // ('0x' || substr(md5(id::varchar),1,8))::BIGINT % 10000 in DuckDB
    val got = Seq(0L, 1L, 2L).toDF("id")
      .select(Sampler.bucket10k(col("id"))).as[Int].collect().toSeq
    assert(got == Seq(6916, 9560, 8605))
  }

  test("sampleStratified: deterministic, rate-monotone, stratum-scoped") {
    import spark.implicits._
    val docs = (0L until 1000L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "s")
    def run(rateA: Int, rateB: Int) = {
      val rates = Seq(("a", rateA), ("b", rateB)).toDF("s", "rate_bp")
      Sampler.sampleStratified(docs, rates, "id", Seq("s")).select("id").as[Long].collect().toSet
    }
    val half = run(5000, 0)
    assert(half.forall(_ % 2 == 0), "rate 0 stratum must be empty")
    // uniformity (loose): ~50% of the 500 "a" docs survive at 5000 bp
    assert(half.size > 175 && half.size < 325)
    // determinism + monotonicity: raising the rate only adds documents
    assert(run(5000, 0) == half)
    assert(half.subsetOf(run(7000, 0)))
    assert(run(10000, 10000).size == 1000)
  }
}
