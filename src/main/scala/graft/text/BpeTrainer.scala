package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative BPE merge-table learning — the tokenizer-TRAINING loop whose
  * single-iteration statistic [[graft.stats.CorpusStats.bpePairStats]]
  * already exposes. Semantics are canonical BPE (Sennrich et al. 2016):
  * start from the character segmentation of each pretoken, repeatedly
  * (a) count adjacent symbol pairs weighted by pretoken corpus frequency,
  * (b) pick the most frequent pair (ties broken by pair string order so
  * the run is deterministic), (c) merge every left-to-right
  * non-overlapping occurrence of that pair into one symbol.
  *
  * Scale shape (the part that must survive 100 TB): the CORPUS is touched
  * exactly once — one explode + one (token) exchange collapses it to the
  * pretoken vocabulary, which Zipf bounds at millions of rows regardless
  * of corpus size. Every one of the `numMerges` iterations then runs over
  * the VOCAB only: pair counting is a map-side-partial aggregate over
  * exploded (pair, cnt) rows, the winner is ONE row to the driver
  * (TakeOrdered — never a full sort), and applying the merge is a
  * map-only typed transform. The vocab lineage is truncated with
  * `localCheckpoint` every few iterations so the plan does not grow
  * linearly with merges (the PageRank/TrainingExport stage pattern).
  *
  * HONEST SCALE BOUNDARY: checkpointing bounds plan depth, but each merge
  * is still one Spark job with a driver round-trip (~0.7 s each here) —
  * a production tokenizer needs ~32k merges, i.e. ~32k sequential jobs,
  * which is NOT a sensible corpus-scale op no matter how cheap each
  * iteration is. That matches practice: real pipelines learn BPE
  * single-node on a SAMPLED subset (HF tokenizers, SentencePiece), and
  * the parts that genuinely run at corpus scale are exactly what this
  * package gates — the one corpus→vocab collapse ([[buildVocab]]), the
  * per-iteration statistic ([[pairStats]] /
  * [[graft.stats.CorpusStats.bpePairStats]]), and the map-only
  * tokenizer APPLY over the full corpus ([[segment]], broadcast merge
  * table). Use `learnMerges` with numMerges in the tens-to-hundreds
  * (gated: 20 merges; BpeTrainerSpec bounds a 100-merge run) to learn on
  * a Spark-resident sample; ship the merge table; `segment` everything.
  *
  * The per-token merge application is inherently sequential (each merge
  * can create the left symbol of the next occurrence), so it is a typed
  * map over vocab rows rather than a SQL expression — which also means
  * DuckDB cannot replay the loop: the gated query `t_bpe_merges` is
  * rows-only, and correctness is pinned by BpeTrainerSpec (the classic
  * low/lower/newest fixture computed by hand, determinism across
  * parallelism, and agreement of iteration 1 with `bpePairStats`).
  */
object BpeTrainer {

  /** Character segmentation of one pretoken: one symbol per code point
    * (surrogate pairs stay together so 4-byte chars never split).
    */
  private[graft] def charSymbols(tok: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < tok.length) {
      val n = tok.codePointAt(i)
      val w = Character.charCount(n)
      out += tok.substring(i, i + w)
      i += w
    }
    out.result()
  }

  /** One left-to-right non-overlapping merge pass — canonical BPE:
    * "aaaaa" under (a,a) becomes ("aa","aa","a").
    */
  private[graft] def mergePair(syms: Vector[String], left: String, right: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == left && syms(i + 1) == right) {
        out += (left + right); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Pretoken vocabulary of `textCol`: (token, cnt), the ONE corpus-sized
    * aggregation of the whole training loop.
    */
  def buildVocab(d: DataFrame, textCol: String): DataFrame =
    d.select(explode(regexp_extract_all(col(textCol),
        lit(TextAnalytics.BpeTokenPattern), lit(0))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).cast("long").as("cnt"))

  /** Frequency-weighted adjacent-pair counts over a segmented vocab
    * (`syms: array<string>`, `cnt: long`) — map-side partial aggregate,
    * only (left, right, n) rows shuffle.
    */
  def pairStats(vocab: DataFrame): DataFrame =
    vocab
      .filter(size(col("syms")) >= 2)
      .select(col("cnt"), explode(arrays_zip(
        slice(col("syms"), lit(1), size(col("syms")) - 1).as("l"),
        slice(col("syms"), lit(2), size(col("syms")) - 1).as("r"))).as("p"))
      .select(col("p.l").as("left"), col("p.r").as("right"), col("cnt"))
      .groupBy(col("left"), col("right")).agg(sum(col("cnt")).cast("long").as("n"))

  /** Learn `numMerges` merges over `textCol`. Returns the merge table
    * (rank, left, right, n) in learned order — the artifact a tokenizer
    * ships. `checkpointEvery` bounds lineage growth.
    */
  def learnMerges(d: DataFrame, textCol: String, numMerges: Int,
                  checkpointEvery: Int = 4): DataFrame = {
    val spark = d.sparkSession
    import spark.implicits._
    var vocab: Dataset[(Vector[String], Long)] =
      buildVocab(d, textCol).as[(String, Long)]
        .map { case (t, c) => (charSymbols(t), c) }
        // materialize the vocab up front: the corpus is scanned exactly
        // once, iterations re-read only the Zipf-bounded checkpoint
        .localCheckpoint(eager = true)
    var out = Vector.empty[(Int, String, String, Long)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val top = pairStats(vocab.toDF("syms", "cnt"))
        .orderBy(col("n").desc, col("left"), col("right"))
        .limit(1).as[(String, String, Long)].collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, n) = top.head
        out :+= ((i + 1, l, r, n))
        vocab = vocab.map { case (syms, c) => (mergePair(syms, l, r), c) }
        if ((i + 1) % checkpointEvery == 0)
          vocab = vocab.localCheckpoint(eager = true)
      }
      i += 1
    }
    spark.createDataset(out).toDF("rank", "left", "right", "n")
  }

  /** Segment `textCol` with a LEARNED merge table — the tokenizer-APPLY
    * step a trainer feed runs over the whole corpus: pretokenize, start
    * from characters, replay merges in rank order (greedy lowest-rank
    * first, canonical BPE inference). The merge table is driver-sized by
    * construction (numMerges rows) and is closed over / broadcast with
    * the task — the corpus itself stays map-only: no shuffle at all.
    */
  def segment(d: DataFrame, textCol: String, merges: Seq[(String, String)],
              idCol: String): DataFrame = {
    val spark = d.sparkSession
    import spark.implicits._
    val rank = merges.zipWithIndex.toMap
    val bRank = spark.sparkContext.broadcast(rank)
    val pre = TextAnalytics.BpeTokenPattern.r
    d.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = pre.findAllIn(if (text == null) "" else text)
        val sb = Vector.newBuilder[String]
        toks.foreach { t => sb ++= applyMerges(charSymbols(t), bRank.value) }
        (id, sb.result())
      }
      .toDF(idCol, "symbols")
  }

  /** Greedy lowest-rank-first merge replay over one token's symbols. */
  private[graft] def applyMerges(start: Vector[String],
                                rank: Map[(String, String), Int]): Vector[String] = {
    var syms = start
    var continue = true
    while (continue && syms.length >= 2) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) continue = false
      else syms = mergePair(syms, syms(bi), syms(bi + 1))
    }
    syms
  }
}
