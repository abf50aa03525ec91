package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing — the trainer-feed step between chunking
  * and sharding: assign documents to fixed-capacity training sequences
  * (bins of `capacity` tokens) so short documents share a sequence instead
  * of each wasting a mostly-padding context window.
  *
  * Strategy: greedy CONTIGUOUS packing per stream. Documents are split
  * into `streams` deterministic sub-streams (`id % streams`), ordered
  * within a stream by `md5(id)` (hash order — any weight-vs-position
  * periodicity in a crawl-ordered corpus would otherwise produce runs of
  * same-sized docs and systematically ragged bins), and a document lands
  * in bin `floor(running_total_before_it / capacity)`. Documents are
  * never split across bins.
  *
  * Packing bound, stated plainly: a document whose prefix sum straddles a
  * capacity boundary overflows its bin by up to its own weight — so every
  * bin's payload is within ONE document of `capacity`, and a document
  * with weight ≥ capacity occupies its own bin span. This is the standard
  * streaming approximation (HF `group_texts` does the same modulo
  * truncation); exact bin-packing is NP-hard and order-dependent, which a
  * distributed deterministic operator must not be.
  *
  * Scale shape: ONE Exchange on `stream` (key space = `streams`, tuned to
  * the cluster), an in-partition sort by the hash key, and two window
  * passes sharing that sort (prefix sum + position). No global key, no
  * SinglePartition funnel; the (stream, seq_no) pair is globally unique.
  * All arithmetic is BIGINT `DIV`/mod, so Spark and the DuckDB oracle
  * agree bit-for-bit.
  */
object SeqPacker {

  /** @return input columns + `stream`, `seq_no` (bin within stream), and
    *         `seq_offset` (token offset of this document inside its bin's
    *         nominal budget).
    */
  def packSequences(d: DataFrame, idCol: String, weightCol: String,
                    capacity: Long, streams: Int): DataFrame = {
    require(capacity > 0 && streams > 0,
      s"capacity/streams must be positive, got $capacity/$streams")
    val stream = pmod(col(idCol), lit(streams.toLong))
    // a `copy` column (Sampler.upsampleByEpochs's repeat index) joins the
    // order key: upsampled input carries the same id several times, md5(id)
    // alone leaves those rows TIED, and a prefix sum over tied peers is
    // order-dependent — seq_no/seq_offset would differ run-to-run and
    // engine-to-engine. Contract: (id) unique, or (id, copy) unique.
    val order = md5(col(idCol).cast("string")) +:
      (if (d.columns.contains("copy")) Seq(col("copy")) else Nil)
    val w = Window.partitionBy(col("stream"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    d.withColumn("stream", stream)
      .withColumn("graft_cum",
        coalesce(sum(col(weightCol)).over(w), lit(0L)))
      .withColumn("seq_no", expr(s"graft_cum DIV ${capacity}L"))
      .withColumn("seq_offset", expr(s"graft_cum % ${capacity}L"))
      .drop("graft_cum")
  }

  /** Per-sequence fill report (map-side partial agg; only
    * (stream, seq_no, counters) rows shuffle): the padding-waste statistic
    * a trainer-feed pipeline watches.
    */
  def sequenceStats(packed: DataFrame, weightCol: String): DataFrame =
    packed.groupBy(col("stream"), col("seq_no"))
      .agg(count(lit(1)).as("n_docs"), sum(col(weightCol)).as("total_weight"))

  /** GPT-style fixed-block slicing — the OTHER trainer feed: concatenate
    * each stream's token stream and cut EXACT `blockTokens` blocks, with
    * documents SPLIT across block boundaries (HF `group_texts` semantics:
    * zero padding, every block full; [[packSequences]] is the whole-doc
    * variant where bins absorb overflow instead). Emits each document's
    * placement in its stream's block space:
    * `stream`, `start_off` (global token offset within the stream),
    * `block_first`/`block_last` (the blocks this document's tokens land
    * in, inclusive), `n_blocks` (0 for zero-weight documents, which
    * occupy no tokens). The same ordering contract as [[packSequences]]
    * applies: (id) unique, or (id, copy) unique for upsampled input.
    *
    * Scale shape: identical to [[packSequences]] — ONE Exchange on
    * `stream`, one in-partition sort, one prefix-sum window; BIGINT
    * DIV/mod only, so the DuckDB oracle replays it bit for bit.
    */
  def sliceBlocks(d: DataFrame, idCol: String, weightCol: String,
                  blockTokens: Long, streams: Int): DataFrame = {
    require(blockTokens > 0 && streams > 0,
      s"blockTokens/streams must be positive, got $blockTokens/$streams")
    val stream = pmod(col(idCol), lit(streams.toLong))
    val order = md5(col(idCol).cast("string")) +:
      (if (d.columns.contains("copy")) Seq(col("copy")) else Nil)
    val w = Window.partitionBy(col("stream"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    d.withColumn("stream", stream)
      .withColumn("start_off",
        coalesce(sum(col(weightCol)).over(w), lit(0L)))
      .withColumn("block_first", expr(s"start_off DIV ${blockTokens}L"))
      .withColumn("block_last",
        when(col(weightCol) > 0,
          expr(s"(start_off + $weightCol - 1) DIV ${blockTokens}L"))
          .otherwise(expr(s"start_off DIV ${blockTokens}L")))
      .withColumn("n_blocks",
        when(col(weightCol) > 0, col("block_last") - col("block_first") + lit(1L))
          .otherwise(lit(0L)))
  }
}
