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

  /** One CDX entry inside an assembled archive: where [[Warc.readRecordAt]]
    * finds the record (`offset`/`length` — the gzip MEMBER span for
    * `.warc.gz`) plus the payload's md5 hex, the integrity column a CDX
    * row carries so a fetched record can be verified without re-reading
    * the source.
    */
  final case class CdxEntry(url: String, ts_ms: Long, offset: Long,
                            length: Long, digest: String)

  /** Assemble (shard, warc) archive blobs. Input columns: url string,
    * epoch-ms long, content-type string, payload binary.
    */
  def toArchives(df: DataFrame, urlCol: String, tsMsCol: String,
                 contentTypeCol: String, payloadCol: String,
                 shards: Int, gzip: Boolean,
                 maxShardBytes: Long = 1L << 30): DataFrame =
    toArchivesIndexed(df, urlCol, tsMsCol, contentTypeCol, payloadCol,
      shards, gzip, maxShardBytes).drop("idx")

  /** [[toArchives]] plus a per-shard `idx: array<struct>` of [[CdxEntry]]
    * rows — the archive and its index built in the SAME task from the
    * same serialization pass, so offsets can never drift from the blob
    * they describe (indexing after the fact would re-parse every byte;
    * indexing during the write is free). Blob bytes are identical to
    * [[toArchives]] — the non-indexed form delegates here.
    */
  def toArchivesIndexed(df: DataFrame, urlCol: String, tsMsCol: String,
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
        val md = java.security.MessageDigest.getInstance("MD5")
        val digests = rows.map { r =>
          md.reset(); md.digest(r._5).map(b => f"$b%02x").mkString
        }
        val (blob, spans) = Warc.writeArchiveIndexed(
          rows.iterator.map(r => (r._2, r._3, r._4, r._5)), gzip)
        val idx = spans.iterator.zip(digests.iterator).map { case (s, d) =>
          CdxEntry(s.url, s.dateMs, s.offset, s.length, d)
        }.toSeq
        (shard, blob, idx)
      }
      .toDF("shard", "warc", "idx")
  }

  /** Flatten an indexed archive table into CDX rows
    * (surt, url, ts_ms, shard, offset, length, digest) — the archive
    * store's lookup table. Map-only over the archive table (one Generate,
    * zero exchanges); the SURT key is [[graft.web.UrlOps.surt]] so a
    * domain's records are one contiguous key range.
    */
  def cdxIndex(archives: DataFrame): DataFrame =
    archives.select(col("shard"), explode(col("idx")).as("e"))
      .select(
        graft.web.UrlOps.surt(col("e.url")).as("surt"),
        col("e.url").as("url"),
        col("e.ts_ms").as("ts_ms"),
        col("shard"),
        col("e.offset").as("offset"),
        col("e.length").as("length"),
        col("e.digest").as("digest"))

  /** The on-disk CDX layout: range-partitioned and sorted by
    * (surt, ts_ms) — exactly ONE RangePartitioning exchange, then an
    * in-partition sort. Written as parquet with per-file min/max stats,
    * a point lookup or a domain prefix scan prunes to the one file whose
    * surt range covers the probe (the `cluster.idx` + sorted-shard layout
    * Common Crawl publishes, re-expressed as parquet range partitioning).
    */
  def cdxSorted(index: DataFrame, partitions: Int): DataFrame = {
    require(partitions >= 1, s"partitions must be >= 1, got $partitions")
    index.repartitionByRange(partitions, col("surt"), col("ts_ms"))
      .sortWithinPartitions(col("surt"), col("ts_ms"))
  }

  /** Point-fetch records through CDX spans: `picks` carries
    * (shard, offset, length) rows — the output of a CDX probe, driver-
    * small by definition (point lookups, not a scan). The pick list is
    * grouped per shard and BROADCAST; the archive table — the 100 TB
    * side — never shuffles a byte, and each matched task slices only the
    * picked spans out of its local blob via [[Warc.readRecordAt]]
    * (ranged-GET semantics against an object store, expressed over the
    * archive table). Output: (shard, url, warc_ts_ms, content_type,
    * payload).
    */
  def fetchBySpans(archives: DataFrame, picks: DataFrame): DataFrame = {
    val spark = archives.sparkSession
    import spark.implicits._
    val spans = picks
      .select(col("shard").cast("long"), col("offset").cast("long"),
        col("length").cast("long"))
      .groupBy(col("shard"))
      .agg(collect_list(struct(col("offset"), col("length"))).as("spans"))
    archives.join(broadcast(spans), "shard")
      .select(col("shard"), col("warc"), col("spans"))
      .as[(Long, Array[Byte], Seq[(Long, Long)])]
      .flatMap { case (shard, blob, spans) =>
        spans.sorted.iterator.map { case (off, len) =>
          val r = Warc.readRecordAt(blob, off, len)
          (shard, r.url, r.dateMs, r.contentType, r.payload)
        }
      }
      .toDF("shard", "url", "warc_ts_ms", "content_type", "payload")
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
