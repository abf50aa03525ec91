package graft.tools

import graft.dedup.{Decontaminate, Dedup}
import graft.text.{Chunker, Redactor, TextAnalytics}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev profiling harness: time each stage of the training-export pipeline
  * in isolation (cold, then warm) to localize the first-run cost the
  * composed `q_training_export` pays.
  */
object ExportProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-export-profile")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
    }

    // mirror SparkEntry's q_training_export fixture
    val id = col("doc_id")
    val piiText = concat(col("text"),
      when(id % 4 === 0, concat(lit(" Contact user"), id.cast("string"), lit("@Mail"),
        (id % 10).cast("string"), lit(".example.com now."))).otherwise(lit("")),
      when(id % 6 === 0, concat(lit(" Server at 10.0."), (id % 256).cast("string"),
        lit("."), (id % 100).cast("string"), lit(" up."))).otherwise(lit("")),
      when(id % 9 === 0, concat(lit(" Call +1555"),
        (lit(1000000) + id % 1000000).cast("string"), lit("."))).otherwise(lit("")))

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      val d = docs0.select(col("doc_id"), piiText.as("text")).localCheckpoint(false)
      val toks = split(trim(col("text")), "\\s+")
      val bench = d.filter(col("doc_id") % 101 === 0 && size(toks) >= 33)
        .select(array_join(slice(toks, 6, 28), " ").as("bench_text"))
      time("fixture checkpoint")(d.count())
      val clean = TextAnalytics.filterClean(d, "text").localCheckpoint(false)
      time("clean gate")(clean.count())
      val deduped = Dedup.dropExactDuplicatesBy(
        clean, "doc_id", TextAnalytics.fingerprint(col("text"))).localCheckpoint(false)
      time("exact dedup")(deduped.count())
      val decon = Decontaminate.dropContaminated(deduped, "doc_id", "text", bench, "bench_text")
        .localCheckpoint(false)
      time("decontaminate")(decon.count())
      val redacted = decon.select(col("doc_id"), Redactor.redact(col("text")).as("text"))
        .localCheckpoint(false)
      time("redact")(redacted.count())
      val chunks = Chunker.chunks(redacted, "doc_id", "text", 16, 12)
      time("chunk")(chunks.count())
    }
    spark.stop()
  }
}
