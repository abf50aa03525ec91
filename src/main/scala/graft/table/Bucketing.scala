package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pre-bucketed co-located joins — the write-once / join-many pattern a
  * 100-TB corpus uses to keep its recurring joins shuffle-free.
  *
  * At the target scale the pages table is joined repeatedly against
  * equally large per-document side tables (embeddings, quality scores,
  * dedup verdicts). Shuffling 100 TB per join is the dominant cost;
  * writing both tables ONCE bucketed by the join key (`bucketBy` on a
  * parquet datasource table) lets every later sort-merge join consume
  * the bucketing as its required distribution — Catalyst plans NO
  * Exchange on either side (gated in BucketingSpec). `sortBy` on the
  * same key additionally lets the per-bucket sort feed the SMJ cheaply.
  *
  * The bucket count is the knob that must survive scale-up: it is
  * fixed at write time and bounds join parallelism, so it is chosen by
  * the WRITER from expected table size (`bucketsFor`), not hardcoded —
  * one bucket should hold O(100 MB–1 GB), and both tables of a
  * recurring join must agree on it (Spark 3/4 joins same-count bucketed
  * tables without exchange; mismatched counts re-shuffle one side).
  */
object Bucketing {

  /** Buckets for an expected table size: ~512 MB of key-group data per
    * bucket, clamped to [8, 65536], rounded up to a power of two so a
    * later 2x re-bucket can split buckets without moving every row.
    */
  def bucketsFor(expectedBytes: Long): Int = {
    val raw = math.max(8L, expectedBytes / (512L << 20))
    var p = 8
    while (p < raw && p < 65536) p <<= 1
    p
  }

  /** Write `df` as a bucketed+sorted parquet datasource table rooted at
    * `path`. The table name is registered in the session catalog (the
    * catalog carries the bucketing metadata that later reads consume);
    * an existing table of the same name is replaced.
    */
  def writeBucketed(df: DataFrame, name: String, path: String,
                    numBuckets: Int, key: String): Unit = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    df.write.format("parquet").option("path", path)
      .bucketBy(numBuckets, key).sortBy(key)
      .mode("overwrite").saveAsTable(name)
  }

  /** Sort-merge join of two same-bucketed tables on their bucket keys.
    * The `merge` hint pins the strategy (a broadcast would also avoid
    * the shuffle but tests nothing at scale — at 100 TB neither side
    * broadcasts); with matching bucket counts the bucketed scans
    * already satisfy the join's required distribution, so the physical
    * plan carries no Exchange (asserted in BucketingSpec).
    */
  def cojoin(spark: SparkSession, left: String, right: String,
             leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.hint("merge").join(r, l(leftKey) === r(rightKey))
  }
}
