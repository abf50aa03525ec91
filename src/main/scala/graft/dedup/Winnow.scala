package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003 —
  * the MOSS algorithm): pick a SMALL, position-aware subset of a
  * document's k-gram hashes such that any passage two documents share is
  * still guaranteed to collide. MinHash ([[Dedup.minhashSignatures]])
  * answers "how similar are these documents overall"; winnowing answers
  * "do they share a passage, and WHERE" — the copy-localization primitive
  * behind plagiarism/mirror-span detection — while storing ~2/(w+1) of
  * the grams instead of all of them.
  *
  * Rule: slide a window of `w` consecutive k-gram hashes; in each window
  * select the minimum hash, breaking ties by RIGHTMOST position (the
  * paper's rule — it maximizes window overlap reuse); a (pos, hash) pair
  * is recorded once however many windows select it.
  *
  * Guarantee (paper, Thm 2): every shared token run of length
  * ≥ w + k − 1 contributes at least one identical selected fingerprint
  * to both documents. Documents with fewer than w + k − 1 tokens emit
  * nothing — by the same theorem winnowing promises nothing there, and
  * the exact-dedup family already owns short-text duplication.
  *
  * Scale shape: entirely map-only per document — tokenization, gram
  * hashing, window minima, and the distinct are nested codegen'd
  * collection HOFs over the row; one explode at the end produces slim
  * (id, pos, fp) rows. Nothing shuffles until a consumer groups selected
  * fingerprints, at which point rows are already ~2/(w+1) of the gram
  * stream. Hashes are 40-bit md5 windows via the repo's portable
  * hex-conv trick, so the DuckDB oracle replays them bit for bit.
  */
object Winnow {

  /** Selected fingerprints: one row (id, pos, fp) per winnowed k-gram;
    * `pos` is the 0-based gram position in the document.
    */
  def winnowFingerprints(d: DataFrame, idCol: String, textCol: String,
                         k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got k=$k w=$w")
    val toks = split(regexp_replace(lower(trim(col(textCol))), "\\s+", " "), " ")
    val nGrams = greatest(size(toks) - lit(k - 1), lit(0))
    // 40-bit gram hash: conv of md5 chars 1-10 (same window the phrase
    // index uses) — portable and collision-thin at any realistic doc size.
    // The guard matters twice over: sequence(0, -1) would run DESCENDING
    // and fabricate bogus short-gram hashes on sub-k docs
    val grams = when(nGrams > 0,
      transform(sequence(lit(0), nGrams - 1),
        i => conv(substring(md5(concat_ws(" ", slice(toks, i + 1, lit(k)))), 1, 10), 16, 10).cast("long")))
      .otherwise(array().cast("array<bigint>"))
    // MATERIALIZE the gram array before windowing, behind a
    // non-deterministic barrier (the filterClean trick): HOF lambdas run
    // interpreted with no cross-element CSE, so an inlined `grams` would
    // be recomputed by EVERY window — O(len²) md5 calls per document,
    // lethal on the giant tail. Behind the barrier each window slices a
    // materialized array<long> instead.
    val staged = d.select(col(idCol), grams.as("graft_grams"))
      .withColumn("_graft_barrier", spark_partition_id())
      .filter(col("_graft_barrier") >= 0)
    val g = col("graft_grams")
    val winCount = size(g) - lit(w - 1)
    // per window: min hash, rightmost-tie position via the reversed slice
    val wins = transform(sequence(lit(0), winCount - 1), { i =>
      val win = slice(g, i + 1, lit(w))
      val mn = array_min(win)
      val pos = i + (lit(w + 1) - array_position(reverse(win), mn)) - 1
      struct(pos.cast("long").as("pos"), mn.as("fp"))
    })
    staged.select(col(idCol), explode(
        when(winCount > 0, array_distinct(wins))
          .otherwise(array().cast("array<struct<pos:bigint,fp:bigint>>"))
      ).as("sel"))
      .select(col(idCol), col("sel.pos").as("pos"), col("sel.fp").as("fp"))
  }

  /** Shared-passage pairs: documents sharing at least `minShared` selected
    * fingerprints — the winnowed analog of the frequent-gram join, at
    * ~2/(w+1) of its row budget. Slim (fp → id) equi-join; fingerprints
    * in more than `maxFpDocs` documents are boilerplate and dropped
    * before pairing (the hot-key bound, cf. [[graft.web.Mirrors]]).
    */
  def sharedPassagePairs(selected: DataFrame, idCol: String,
                         minShared: Long, maxFpDocs: Int = 50): DataFrame = {
    val slim = selected.select(col(idCol).as("id"), col("fp")).distinct()
    val ok = slim.groupBy("fp").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2 && col("n_docs") <= maxFpDocs).select("fp")
    val s = slim.join(ok, "fp")
    s.as("a").join(s.as("b"), col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
