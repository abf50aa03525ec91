package graft.warc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spark surface for [[Warc]]: assemble per-shard archive blobs from a
  * row-per-record table, and explode archive blobs back into records.
  *
  * Scale shape (10^12 records):
  *  - assembly is ONE shard-keyed exchange; the shard key is an md5
  *    bucket of the url, so a hot host spreads across shards and no
  *    global order exists anywhere. Records sort within their shard only
  *    (groups are independent), making each archive byte-deterministic
  *    at any parallelism — re-running a failed write task produces the
  *    identical blob, which is what makes speculative execution and
  *    retries safe for a bytewise-committed archive.
  *  - each task materializes exactly one shard's bytes; `maxShardBytes`
  *    fails loudly BEFORE an oversized blob is handed to the writer (a
  *    production job sizes shards so this never fires; the honest
  *    alternative — silent multi-GB driver-of-executor allocations — is
  *    how archive writers fall over at scale).
  *  - parsing is map-only: one task per blob, no exchange at all; real
  *    deployments point it at `binaryFile`-read `.warc.gz` objects, one
  *    archive per input split.
  */
object WarcShards {

  /** md5-bucket shard of a url column — literally
    * [[graft.sample.Importance.gramBucket]], the engine-portable bucket
    * convention (one implementation, so the hash window can never drift).
    */
  def shardOf(url: Column, shards: Int): Column =
    graft.sample.Importance.gramBucket(url, shards)

  /** Assemble (shard, warc) archive blobs. Input columns: url string,
    * epoch-ms long, content-type string, payload binary.
    */
  def toArchives(df: DataFrame, urlCol: String, tsMsCol: String,
                 contentTypeCol: String, payloadCol: String,
                 shards: Int, gzip: Boolean,
                 maxShardBytes: Long = 1L << 30): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
        shardOf(col(urlCol), shards).as("shard"),
        col(urlCol).cast("string").as("url"),
        col(tsMsCol).cast("long").as("ts"),
        col(contentTypeCol).cast("string").as("ct"),
        col(payloadCol).cast("binary").as("p"))
      .as[(Long, String, Long, String, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (shard, it) =>
        // order by the FULL record, payload bytes included: a url crawled
        // twice (same url, two timestamps — normal crawl data) must land
        // in the same order on a retried/speculative task attempt, or the
        // byte-determinism contract below is false exactly when it matters
        val rows = it.toArray.sortWith { (x, y) =>
          val c1 = x._2.compareTo(y._2)
          if (c1 != 0) c1 < 0
          else if (x._3 != y._3) x._3 < y._3
          else {
            val c3 = x._4.compareTo(y._4)
            if (c3 != 0) c3 < 0
            else java.util.Arrays.compareUnsigned(x._5, y._5) < 0
          }
        }
        val payloadBytes = rows.iterator.map(_._5.length.toLong).sum
        require(payloadBytes <= maxShardBytes,
          s"shard $shard carries $payloadBytes payload bytes > $maxShardBytes; raise the shard count")
        (shard, Warc.writeArchive(
          rows.iterator.map(r => (r._2, r._3, r._4, r._5)), gzip))
      }
      .toDF("shard", "warc")
  }

  /** Explode archive blobs into records:
    * (url, warc_ts_ms, record_type, content_type, content_length,
    * payload). Map-only; gzip auto-detected per blob.
    */
  def parse(df: DataFrame, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(bytesCol).cast("binary")).as[Array[Byte]]
      .flatMap { bytes =>
        Warc.parseArchive(bytes).records.iterator.map(r =>
          (r.url, r.dateMs, r.recordType, r.contentType,
            r.payload.length.toLong, r.payload))
      }
      .toDF("url", "warc_ts_ms", "record_type", "content_type",
        "content_length", "payload")
  }

  /** Per-blob integrity metrics (the lineage row a crawl reader logs):
    * (n_records, skipped_bytes). Map-only.
    */
  def archiveStats(df: DataFrame, bytesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(bytesCol).cast("binary")).as[Array[Byte]]
      .map { bytes =>
        val r = Warc.parseArchive(bytes)
        (r.records.size.toLong, r.skippedBytes)
      }
      .toDF("n_records", "skipped_bytes")
  }
}
