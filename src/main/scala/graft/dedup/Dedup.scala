package graft.dedup

import graft.text.TextAnalytics
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a large-scale training-data pipeline:
  * exact (hash-groupBy), MinHash+LSH near-dup candidate generation,
  * n-gram Jaccard verification, and 64-bit SimHash.
  *
  * Design-for-scale notes (10^12-row design point):
  *  - every stage is a declarative DataFrame op, so Catalyst gets column
  *    pruning + pushdown; the only shuffles are the ones the semantics
  *    require (groupBy on a 32/64-char key, band-equi-join);
  *  - exact dedup shuffles md5 keys, never document bodies;
  *  - LSH banding turns the O(n²) near-dup problem into equi-joins on
  *    band values — each join key is a constant-width string, AQE handles
  *    skewed buckets (a degenerate band value = a hot key) by splitting;
  *  - signatures/fingerprints are pure `functions._` expressions
  *    (codegen'd, no UDFs), computed in one projection pass over the text.
  *
  * The reference has no dedup (SURVEY §2.5); its only key-equality
  * construct is the cache anti-join (F5). These operators are the
  * corpus-scale generalization the north_star's training-data pipeline
  * needs.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact-duplicate groups by content hash: one row per distinct text,
    * with the canonical survivor (min id) and the duplicate count.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Exact dedup: keep one row per distinct text (the min-id survivor).
    * Broadcast-ineligible at corpus scale — this is the canonical
    * shuffle-on-short-key pattern; only (id, hash) move, not documents.
    */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    dropExactDuplicatesBy(df, idCol, md5(col(textCol)))

  /** [[dropExactDuplicates]] under a caller-supplied duplicate key (e.g.
    * [[graft.text.TextAnalytics.fingerprint]] for whitespace/case-
    * insensitive dedup) — the key definition is the policy decision; the
    * shuffle shape is identical.
    */
  def dropExactDuplicatesBy(df: DataFrame, idCol: String, key: org.apache.spark.sql.Column): DataFrame = {
    val keep = df.groupBy(key.as("h")).agg(min(col(idCol)).as(idCol)).select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  // ---------------------------------------------------------- incremental

  /** Incremental (delta) dedup: keep only the genuinely-NEW documents of a
    * crawl batch, given the duplicate-key index of the already-committed
    * corpus. A document survives iff (a) it is the first (min-id) holder of
    * its key WITHIN the batch and (b) its key is absent from the index.
    *
    * This is how dedup actually runs at the 10^12-row design point: the
    * committed corpus is never re-scanned. A slim key index (one 32-hex
    * fingerprint per committed document) is maintained alongside the
    * snapshot — the same shape as the resume cache in
    * [[graft.job.ExtractJob]], which anti-joins urls instead of content
    * keys — and each crawl delta is checked against it. All dedup work
    * happens on slim (id, key) rows: the batch projects to (id, key),
    * collapses to its min-id survivor per key (map-side partial `min`),
    * anti-joins the index on the constant-width key, and only the
    * surviving ids pull their payload back via a semi-join. Document
    * bodies never shuffle on the content key; with both the index and the
    * batch bucketed by key the anti-join is co-located and shuffle-free.
    */
  def dropSeenDocuments(batch: DataFrame, idCol: String, key: Column,
                        index: DataFrame, indexKeyCol: String): DataFrame = {
    val firstInBatch = batch.select(col(idCol), key.as("graft_fp"))
      .groupBy(col("graft_fp")).agg(min(col(idCol)).as(idCol))
    val novel = firstInBatch
      .join(index.select(col(indexKeyCol).as("graft_fp")).distinct(), Seq("graft_fp"), "left_anti")
      .select(col(idCol))
    batch.join(novel, Seq(idCol), "left_semi")
  }

  // ------------------------------------------------------------- shingles

  /** Word n-gram shingles (space-joined), 1-indexed positions to match the
    * portable SQL formulation; empty array when the text has < n words.
    *
    * The token array is LAMBDA-BOUND (`transform(array(tokens), ws -> …)`)
    * rather than referenced from inside the gram lambda: higher-order
    * functions evaluate interpreted (outside codegen) with no common-
    * subexpression elimination, so a captured `split(...)` would re-run
    * per gram element — O(words²) regex splits per document. Binding it as
    * a lambda variable evaluates it exactly once per row.
    */
  def shingles(c: Column, n: Int = 3): Column = {
    val grams = transform(array(TextAnalytics.tokens(c)), ws =>
      when(size(ws) >= n,
        transform(
          sequence(lit(1), size(ws) - lit(n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + lit(j))): _*)
        )
      ).otherwise(array().cast("array<string>")))
    element_at(grams, 1)
  }

  /** Distinct shingle set (Jaccard operates on sets). */
  def shingleSet(c: Column, n: Int = 3): Column = array_distinct(shingles(c, n))

  // -------------------------------------------------------------- minhash

  /** k-permutation MinHash signature over word-3-gram shingles. Each
    * "permutation" is md5 with a seed prefix; the signature component is
    * the lexicographic min of the hex digests (portable across engines —
    * hex strings compare like the underlying 128-bit value).
    *
    * Shape chosen for scale: explode shingles → k codegen'd `min(md5(…))`
    * aggregates. `min` is algebraic, so the partial aggregate runs
    * map-side and only (id, k×32-char) partials shuffle — at 10^12 rows
    * this is a partial-agg-dominated plan, never a document shuffle.
    * (An `array_min(transform(…))` per column would run interpreted and
    * re-traverse the shingle array k times per row.)
    * Documents with < n words have no shingles and drop out, matching the
    * SQL `GROUP BY` oracle semantics.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String, k: Int = 8, n: Int = 3): DataFrame = {
    val exploded = df.select(col(idCol).as("id"), explode(shingleSet(col(textCol), n)).as("s"))
    val aggs = (0 until k).map(h => min(md5(concat(lit(s"$h:"), col("s")))).as(s"mh$h"))
    exploded.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash Jaccard ESTIMATE for LSH candidate pairs: the fraction of
    * matching signature components, `est_ppm = matches · 10^6 DIV k` —
    * the unbiased estimator (E[match] = J, standard error ~1/√k) that
    * corpus-scale dedup acts on when exact verification is skipped: the
    * exact path ([[jaccardForPairs]]) re-shingles BOTH documents of every
    * candidate pair — a second full pass over text — while the estimator
    * answers from the k components already in hand. Output
    * (id1, id2, matches, est_ppm) for every banded candidate pair.
    *
    * Scale shape: signatures are computed ONCE (lazy checkpoint — three
    * consumers: banding, and both sides of the match join); candidates
    * come from the usual constant-width band equi-join; the match count
    * is a codegen'd k-term comparison on the slim (id, k×32-hex) rows.
    * Text never enters after the signature pass.
    */
  def minhashEstimates(df: DataFrame, idCol: String, textCol: String,
                       k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    require(k % rowsPerBand == 0, s"rowsPerBand=$rowsPerBand must divide k=$k")
    val sig = minhashSignatures(df, idCol, textCol, k).localCheckpoint(eager = false)
    val bands = bandsFromSignatures(sig, k, rowsPerBand)
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2")).distinct()
    val s1 = sig.select(col("id").as("id1") +:
      (0 until k).map(h => col(s"mh$h").as(s"_a$h")): _*)
    val s2 = sig.select(col("id").as("id2") +:
      (0 until k).map(h => col(s"mh$h").as(s"_b$h")): _*)
    val matches = (0 until k)
      .map(h => when(col(s"_a$h") === col(s"_b$h"), 1L).otherwise(0L))
      .reduce(_ + _)
    cand.join(s1, "id1").join(s2, "id2")
      .select(col("id1"), col("id2"), matches.as("matches"))
      .select(col("id1"), col("id2"), col("matches"),
        expr(s"matches * 1000000 DIV $k").as("est_ppm"))
  }

  /** (id, band, bv) exploded LSH banding of the MinHash signature:
    * k/rowsPerBand bands, band value = concat of its signature rows.
    * Two documents are near-dup candidates iff they collide on ≥1 band.
    */
  def lshBands(df: DataFrame, idCol: String, textCol: String, k: Int = 8, rowsPerBand: Int = 2): DataFrame =
    bandsFromSignatures(minhashSignatures(df, idCol, textCol, k), k, rowsPerBand)

  /** Banding over an ALREADY-COMPUTED signature relation `(id, mh0..mhk)`
    * — the one banding construction every LSH consumer shares (a layout
    * change here reaches candidates and estimator alike, in lockstep
    * with the SQL twin's band CTE).
    */
  private def bandsFromSignatures(sig: DataFrame, k: Int, rowsPerBand: Int): DataFrame = {
    val bandStructs = (0 until k / rowsPerBand).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), concat_ws("|", parts: _*).as("bv"))
    }
    sig.select(col("id"), explode(array(bandStructs: _*)).as("bd"))
      .select(col("id"), col("bd.band").as("band"), col("bd.bv").as("bv"))
  }

  /** Near-dup candidate pairs (id1 < id2) via LSH band equi-join.
    * The join key (band, bv) is a short constant-width string: at scale
    * this is a plain shuffled equi-join; AQE skew-split handles degenerate
    * buckets (e.g. boilerplate-only documents hashing identically).
    */
  def lshCandidatePairs(df: DataFrame, idCol: String, textCol: String, k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val bands = lshBands(df, idCol, textCol, k, rowsPerBand)
    bands.as("a")
      .join(bands.as("b"), col("a.band") === col("b.band") && col("a.bv") === col("b.bv") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
  }

  /** End-to-end near-duplicate REMOVAL: MinHash-LSH candidates → exact
    * shingle-Jaccard verification at `tauPct`/100 → greedy keep-min-id
    * survivor policy (every verified pair has id1 < id2; dropping all id2s
    * keeps each pair's minimum — for chains a~b~c without a~c this keeps
    * `a` and drops both others, a deliberate greedy approximation of
    * connected components, which would need iterative joins).
    *
    * The threshold compares `inter · 100 ≥ uni · tauPct` — integer
    * cross-multiplication, no float division, engine-portable. Scale
    * shape: candidates are slim id pairs from banded equi-joins (D3),
    * verification re-joins shingle sets per candidate (D4), the drop set
    * is a distinct id column, and the final filter is a left anti-join —
    * no stage touches more than (id, shingle)-sized rows besides the
    * final survivor join.
    */
  def dropNearDuplicates(
      df: DataFrame, idCol: String, textCol: String,
      tauPct: Int = 50, k: Int = 8, rowsPerBand: Int = 2, n: Int = 3
  ): DataFrame = {
    val cand = lshCandidatePairs(df, idCol, textCol, k, rowsPerBand)
    val verified = jaccardForPairs(df, cand, idCol, textCol, n)
      .filter(col("inter") * lit(100) >= col("uni") * lit(tauPct))
    val drops = verified.select(col("id2").as(idCol)).distinct()
    df.join(drops, Seq(idCol), "left_anti")
  }

  /** Connected components over an undirected pair set `(id1, id2)`:
    * returns `(id, label)` for every id that appears in a pair, where
    * `label` is the component's minimum id.
    *
    * Algorithm: min-label propagation — each round every node takes the
    * minimum of its own label and its neighbors' labels; converged when no
    * label changed. Rounds needed = graph diameter, which for verified
    * near-duplicate components is tiny (duplicate clusters are dense —
    * chains longer than a handful of hops essentially do not occur in
    * corpus dedup); `maxIter` is a guarded ceiling, not a silent truncation
    * (exceeding it throws rather than returning wrong labels). Scale
    * shape: only slim (id, label) rows move through the per-round
    * equi-joins; `localCheckpoint` truncates the iterative lineage so the
    * plan does not grow with rounds. The convergence check is a count —
    * an aggregate, not a collect. (For adversarially-deep graphs the
    * classic upgrade is large-star/small-star contraction, O(log n)
    * rounds; not needed for the near-dup workload this serves.)
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs
      .select(col("id1").as("src"), col("id2").as("dst"))
      .union(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("src").as("id"), col("src").as("label")).distinct()
      .localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0) {
      require(i < maxIter,
        s"connectedComponents did not converge in $maxIter rounds (graph diameter too large)")
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("label").as("nl")), "dst")
        .groupBy(col("src").as("id")).agg(min(col("nl")).as("nbr"))
      val updated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nbr"), col("label"))).as("label"))
        .localCheckpoint()
      changed = updated
        .join(labels.select(col("id"), col("label").as("old")), "id")
        .filter(col("label") < col("old")).count()
      labels = updated
      i += 1
    }
    labels
  }

  /** [[dropNearDuplicates]] with the CONNECTED-COMPONENTS survivor policy:
    * candidates and verification as in the greedy variant, but survivors
    * are one per component (the minimum id), not "every id1 of a verified
    * pair". The policies differ on shapes like pairs (1,3),(2,3): greedy
    * keeps {1,2} (2 never appears as an id2), CC keeps {1} — one document
    * per duplicate cluster, the policy corpus-scale dedup pipelines
    * actually want.
    */
  def dropNearDuplicatesCC(
      df: DataFrame, idCol: String, textCol: String,
      tauPct: Int = 50, k: Int = 8, rowsPerBand: Int = 2, n: Int = 3
  ): DataFrame = {
    val labels = clusterLabels(df, idCol, textCol, tauPct, k, rowsPerBand, n)
    val drops = labels.filter(col("id") =!= col("label")).select(col("id").as(idCol))
    df.join(drops, Seq(idCol), "left_anti")
  }

  /** The shared candidates → verify → component-label prefix of BOTH
    * cluster-based survivor policies ([[dropNearDuplicatesCC]],
    * [[dropNearDuplicatesBest]]): the two policies must elect from the
    * SAME clusters, so the clustering lives in one place.
    */
  private def clusterLabels(df: DataFrame, idCol: String, textCol: String,
                            tauPct: Int, k: Int, rowsPerBand: Int, n: Int): DataFrame = {
    val cand = lshCandidatePairs(df, idCol, textCol, k, rowsPerBand)
    val verified = jaccardForPairs(df, cand, idCol, textCol, n)
      .filter(col("inter") * lit(100) >= col("uni") * lit(tauPct))
      .select(col("id1"), col("id2"))
    connectedComponents(verified)
  }

  /** [[dropNearDuplicatesCC]] with a QUALITY-RANKED survivor: instead of
    * the arbitrary minimum id, each duplicate cluster keeps the document
    * maximizing `score` (ties → minimum id). This is what production
    * dedup actually wants — near-dup clusters mix a clean original with
    * truncated scrapes and ad-injected mirrors, and min-id keeps
    * whichever was crawled first; ranking by a quality signal (length,
    * classifier score, [[graft.sample.Tiering]] tier) keeps the best copy
    * (cf. the survivor-selection step in RefinedWeb/FineWeb-style
    * pipelines). `score` is any integer-valued Column over `df`'s
    * columns; bigger wins.
    *
    * Scale shape: identical to the CC variant up to the label fixpoint
    * (banded candidates → verify → min-label propagation over the slim
    * clustered subset). Survivor election adds two slim aggregates over
    * (label, id, score) triples — max score per label, then min id at
    * that score — never a window over documents; payloads move only in
    * the final anti-join (AQE broadcasts the drop list when small).
    */
  def dropNearDuplicatesBest(
      df: DataFrame, idCol: String, textCol: String, score: Column,
      tauPct: Int = 50, k: Int = 8, rowsPerBand: Int = 2, n: Int = 3
  ): DataFrame = {
    val labels = clusterLabels(df, idCol, textCol, tauPct, k, rowsPerBand, n)
    val scored = labels.join(
      df.select(col(idCol).as("id"), score.cast("long").as("_score")), Seq("id"))
    val best = scored.groupBy(col("label")).agg(max(col("_score")).as("_mx"))
    val keep = scored.join(best, Seq("label"))
      .filter(col("_score") === col("_mx"))
      .groupBy(col("label")).agg(min(col("id")).as("_keep"))
    val drops = scored.join(keep, Seq("label"))
      .filter(col("id") =!= col("_keep")).select(col("id").as(idCol))
    df.join(drops, Seq(idCol), "left_anti")
  }

  /** Corpus-frequent-passage (boilerplate) mass per document: how much of
    * each document consists of word n-grams that appear in at least
    * `minDf` DISTINCT documents (cookie banners, nav footers, license
    * blurbs — the passages document-level dedup misses because the
    * documents differ everywhere else; the passage-level complement of
    * RefinedWeb/CCNet line dedup).
    *
    * Output: (id, n_grams, n_frequent, is_boilerplate) for every document
    * with ≥ n words; `is_boilerplate` gates on integer
    * cross-multiplication (frequent grams > `tauPct`% of grams).
    *
    * Scale shape: the corpus explodes ONCE into slim (id, 32-hex md5)
    * rows (per-document sets — `array_distinct` is row-local, so a gram's
    * count IS its document frequency); the df aggregation shuffles those
    * keys with map-side partials; the frequent head (Zipf: df ≥ minDf is
    * a tiny fraction of distinct grams) joins back — broadcast when small
    * enough, a slim key-shuffle otherwise (AQE decides); the final
    * per-document counts aggregate on id. Documents never shuffle.
    */
  def frequentGramStats(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 8, minDf: Int = 2, tauPct: Int = 50): DataFrame = {
    // three consumers reference `grams` (the df-count agg, the join-back,
    // and the per-doc totals) — materialize the slim (id, gh) rows ONCE
    // (lazy localCheckpoint, same stage-checkpoint move as TrainingExport /
    // LinkGraph.domainRank; a durable-table write on a real cluster), or
    // Catalyst re-runs the corpus-wide explode+hash subtree per consumer
    val grams = Decontaminate.ngramHashes(df, idCol, textCol, n)
      .localCheckpoint(eager = false)
    val frequent = grams.groupBy(col("gh"))
      .agg(count(lit(1)).as("gdf"))
      .filter(col("gdf") >= minDf)
      .select(col("gh"))
    val freqPerDoc = grams.join(frequent, Seq("gh"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_frequent"))
    grams.groupBy(col("id")).agg(count(lit(1)).as("n_grams"))
      .join(freqPerDoc, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_grams"),
        coalesce(col("n_frequent"), lit(0L)).as("n_frequent"),
        (coalesce(col("n_frequent"), lit(0L)) * lit(100) > col("n_grams") * lit(tauPct))
          .as("is_boilerplate"))
  }

  // -------------------------------------------------------------- jaccard

  /** n-gram Jaccard for given candidate pairs: returns integer
    * intersection/union sizes (ratio = inter/uni, left to the caller so
    * results stay float-free and engine-portable).
    */
  def jaccardForPairs(df: DataFrame, pairs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val sets = df.select(col(idCol).as("id"), shingleSet(col(textCol), n).as("sh"))
    pairs
      .join(sets.withColumnRenamed("id", "id1").withColumnRenamed("sh", "sh1"), "id1")
      .join(sets.withColumnRenamed("id", "id2").withColumnRenamed("sh", "sh2"), "id2")
      .select(
        col("id1"), col("id2"),
        size(array_intersect(col("sh1"), col("sh2"))).cast("long").as("inter"),
        size(array_union(col("sh1"), col("sh2"))).cast("long").as("uni")
      )
  }

  /** Overlapping-pairs Jaccard within groups of `groupCol`: every same-
    * group pair sharing ≥ 1 shingle, with integer inter/union sizes.
    *
    * Shape: explode distinct shingles → equi-join on (group, shingle) →
    * count per pair. Fully codegen'd (an array_intersect per pair would run
    * interpreted per output row), and the join key is (group, shingle) so
    * the corpus shuffles once by shingle — the same plan DuckDB's oracle
    * uses and the shape that survives scale-up. Pairs with zero overlap
    * are (deliberately) absent — at corpus scale emitting the quadratic
    * zero-overlap set is never what you want; use [[jaccardForPairs]] with
    * an explicit candidate list when you need specific pairs regardless.
    */
  def jaccardWithinGroups(df: DataFrame, idCol: String, textCol: String, groupCol: String, n: Int = 3): DataFrame = {
    val ds = df
      .select(col(groupCol).as("g"), col(idCol).as("id"), explode(shingleSet(col(textCol), n)).as("s"))
    val sizes = ds.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    val inter = ds.as("a")
      .join(ds.as("b"), col("a.g") === col("b.g") && col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id1").withColumnRenamed("sz", "sz1"), "id1")
      .join(sizes.withColumnRenamed("id", "id2").withColumnRenamed("sz", "sz2"), "id2")
      .select(col("id1"), col("id2"), col("inter"),
        (col("sz1") + col("sz2") - col("inter")).as("uni"))
  }

  /** ASYMMETRIC n-gram containment within groups — the quote/embedding
    * detector Jaccard structurally misses: a short document fully quoted
    * inside a long one has Jaccard ≈ |short|/|long| (arbitrarily small)
    * but containment = 1.0. Broder's containment coefficient
    * `|A∩B| / min(|A|,|B|)`, in fixed-point ppm so the oracle replays it
    * exactly. Emits pairs at `cont_ppm ≥ minPpm`:
    * (id1, id2, inter, sz1, sz2, cont_ppm) with id1 < id2.
    *
    * Shape (identical scale budget to [[jaccardWithinGroups]]): explode
    * distinct shingles → ONE (group, shingle) equi-join → count per pair;
    * zero-overlap pairs never materialize, and the threshold prunes the
    * survivor set before the size join.
    */
  def containmentWithinGroups(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, n: Int = 3, minPpm: Long = 500000L): DataFrame = {
    require(minPpm >= 0 && minPpm <= 1000000L,
      s"minPpm must be in [0, 10^6], got $minPpm")
    val ds = df
      .select(col(groupCol).as("g"), col(idCol).as("id"),
        explode(shingleSet(col(textCol), n)).as("s"))
    val sizes = ds.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    ds.as("a")
      .join(ds.as("b"),
        col("a.g") === col("b.g") && col("a.s") === col("b.s") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("id", "id1").withColumnRenamed("sz", "sz1"), "id1")
      .join(sizes.withColumnRenamed("id", "id2").withColumnRenamed("sz", "sz2"), "id2")
      .withColumn("cont_ppm", expr("(inter * 1000000L) DIV least(sz1, sz2)"))
      .where(col("cont_ppm") >= minPpm)
      // USING joins move their key first; pin the documented column order
      .select(col("id1"), col("id2"), col("inter"), col("sz1"), col("sz2"), col("cont_ppm"))
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash over word unigrams: per-word xxhash64, each bit
    * position votes +1/−1, positive sums set the bit. The word-hash array
    * is lambda-bound (same trick as [[shingles]]) so the split+hash pass
    * runs once per row, not once per bit.
    */
  def simhash64(textColName: String): Column = expr(
    s"""element_at(transform(
       |  array(transform(split(trim($textColName), '\\\\s+'), w -> xxhash64(w))),
       |  hs -> aggregate(
       |    transform(sequence(0, 63), i ->
       |      if(aggregate(hs, 0L, (s, h) -> s + if(bit_get(h, i) = 1, 1, -1)) > 0,
       |         shiftleft(1L, i), 0L)),
       |    0L, (acc, b) -> acc | b)), 1)""".stripMargin
  )

  /** [[simhash64]] via the native codegen'd Catalyst expression
    * ([[graft.functions.SimHash64Expression]]) — bit-exact with the HOF
    * formulation (proven in SimHashExpressionSpec) but stays inside
    * whole-stage codegen. Registers the function on the df's session
    * (idempotent).
    */
  def simhash64Native(df: DataFrame, textColName: String): Column = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    expr(s"${graft.functions.GraftFunctions.SimHashName}($textColName)")
  }

  /** SimHash near-dup pairs: band the 64-bit hash into four 16-bit chunks
    * (pigeonhole: hamming ≤ 3 ⇒ ≥1 identical chunk), equi-join per chunk,
    * then verify with `bit_count(xor) ≤ maxHamming`.
    */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val hashed = df.select(col(idCol).as("id"), simhash64Native(df, textCol).as("sh"))
    val banded = hashed.select(
      col("id"), col("sh"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"), expr(s"(sh >> ${16 * b}) & 65535").as("chunk"))): _*)).as("bd")
    ).select(col("id"), col("sh"), col("bd.band").as("band"), col("bd.chunk").as("chunk"))
    banded.as("a")
      .join(banded.as("b"), col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        expr("bit_count(a.sh ^ b.sh)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
