package graft.streaming

import graft.job.{ExtractJob, ExtractKernel}
import graft.model.{FieldRule, PageRow}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming ingest: the same extraction kernel over a
  * continuously-arriving pages table (`readStream` file source →
  * `foreachBatch` → snapshot commits).
  *
  * Exactly-once without a transactional sink: the file source's checkpoint
  * makes batch ids + contents replayable, and each micro-batch commits to
  * [[graft.table.SnapshotTable]] under `epoch-<batchId>` — a restart that
  * replays the last batch finds its commit id already in the manifest and
  * skips it (same idempotent-recommit discipline the batch job uses, SURVEY
  * §7.4.4). This mirrors the reference's SSE incremental visibility
  * (`/root/reference/src/main.py:630-672`): results become queryable per
  * committed epoch, not at job end.
  */
object StreamingExtract {

  val PageSchema: StructType = Encoders.product[PageRow].schema

  /** Start continuous extraction from parquet files arriving in `inputDir`.
    * `Trigger.AvailableNow` drains what exists and stops (test/batch-catchup
    * mode); pass `ProcessingTime` for a long-running tail.
    */
  def start(
      spark: SparkSession,
      inputDir: String,
      tableRoot: String,
      rules: Seq[FieldRule] = ExtractKernel.DefaultRules,
      trigger: Trigger = Trigger.AvailableNow()
  ): StreamingQuery = {
    import spark.implicits._
    val pages = spark.readStream
      .schema(PageSchema)
      .parquet(inputDir)
      .as[PageRow]

    pages.writeStream
      .foreachBatch { (batch: Dataset[PageRow], batchId: Long) =>
        val commitId = s"epoch-$batchId"
        val rt = ExtractJob.resultsTable(tableRoot)
        val alreadyCommitted = rt.latest().exists(_.dataDirs.exists(_.endsWith(commitId)))
        if (!alreadyCommitted) {
          val (res, _) = ExtractJob.extractAll(batch, rules, commitId)
          rt.append(res.toDF(), commitId)
        }
        ()
      }
      .option("checkpointLocation", s"$tableRoot/_stream_checkpoint")
      .trigger(trigger)
      .start()
  }

  /** Watermarked windowed ingest metrics (pages and bytes per event-time
    * window per lang) — the streaming analog of the batch job's
    * per-partition metrics. Late pages beyond the watermark are dropped
    * from the aggregation, never from extraction (extraction is per-row and
    * stateless).
    */
  def windowedMetrics(pages: Dataset[PageRow], windowLen: String = "10 minutes", watermark: String = "1 hour"): DataFrame =
    pages.toDF()
      .withWatermark("warc_ts", watermark)
      .groupBy(window(col("warc_ts"), windowLen), col("lang"))
      .agg(count(lit(1)).as("n_pages"), sum(length(col("html"))).as("payload_bytes"))
}
