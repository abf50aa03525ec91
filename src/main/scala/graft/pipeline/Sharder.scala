package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic balanced shard packing — the last step of a trainer feed:
  * spread documents across `numShards` output shards so every shard gets
  * close to the same total token weight (a trainer reading shards in
  * parallel is bottlenecked by the heaviest one; naive hash-mod sharding
  * balances COUNTS, not weights).
  *
  * Strategy: size-bucket round-robin, a deterministic LPT relaxation.
  * Documents are bucketed by coarse weight class (`weight / bucketWidth` —
  * within a bucket all weights agree to within bucketWidth), and each
  * bucket is dealt round-robin across the shards IN HASH ORDER of the id.
  * Two balance properties follow: (a) hard — per shard, the COUNT from
  * each size class differs by at most 1, so count balance is exact and
  * weight spread per stream is bounded by ceil(k/numShards)·bucketWidth;
  * (b) statistical — the md5 deal order decorrelates weight from position
  * (id order must NOT be used: any periodicity in weight-vs-id, common in
  * synthetic or crawl-ordered corpora, would alias with the shard cycle
  * and systematically load one shard), so the expected spread shrinks to
  * O(bucketWidth·√k) per stream and amortizes as the corpus grows.
  *
  * Caveat for size classes RARER than numShards (a handful of giant
  * documents): their placement is balls-into-bins over the hashed stream
  * phases — max load O(log k), not exactly 1 — so the spread can reach a
  * few giant-weights. A pipeline needing exact giant placement should LPT
  * the giant tail driver-side (it is tiny by definition; cf. ExtractJob's
  * giants-first layout) and union it back; this operator stays fully
  * distributed and oblivious by design.
  *
  * Scale shape: the round-robin needs a per-bucket row_number. A window
  * partitioned only by bucket would funnel the whole corpus through
  * ~maxWeight/bucketWidth partitions — hot keys at 10^12 rows. So each
  * bucket is split into `subGroups` deterministic sub-streams
  * (`id % subGroups`) and the window partitions by (bucket, sub): the sort
  * key space scales with subGroups (tune it to the cluster), and since
  * every sub-stream is dealt round-robin independently, the union stays
  * balanced. One Exchange on (bucket, sub), in-partition sort by id, zero
  * further shuffles.
  */
object Sharder {

  def assignShards(d: DataFrame, idCol: String, weightCol: String,
                   numShards: Int, bucketWidth: Long, subGroups: Int): DataFrame = {
    require(numShards > 0 && bucketWidth > 0 && subGroups > 0,
      s"numShards/bucketWidth/subGroups must be positive, got $numShards/$bucketWidth/$subGroups")
    val bucket = floor(col(weightCol) / lit(bucketWidth.toDouble)).cast("long")
    val sub = pmod(col(idCol), lit(subGroups.toLong)).cast("long")
    // deal order = md5(id): deterministic, engine-portable, and free of
    // weight-position correlation (see scaladoc). A `copy` column
    // (Sampler.upsampleByEpochs's repeat index) joins the key — upsampled
    // input repeats ids, and tied row_number peers would shard
    // nondeterministically. Contract: (id) unique, or (id, copy) unique.
    val order = md5(col(idCol).cast("string")) +:
      (if (d.columns.contains("copy")) Seq(col("copy")) else Nil)
    val w = Window.partitionBy(col("bucket"), col("graft_sub"))
      .orderBy(order: _*)
    // each stream starts its cycle at a deterministic per-stream phase:
    // without it every stream's FIRST document lands on shard 0, biasing
    // shard 0 by one bucket-weight per stream (visible whenever streams
    // are short — e.g. a rare giant-document bucket)
    val phase = pmod(col("bucket") * 31L + col("graft_sub"), lit(numShards.toLong))
    d.withColumn("bucket", bucket)
      .withColumn("graft_sub", sub) // graft_ prefix: never clobber caller columns
      .withColumn("shard",
        pmod(row_number().over(w).cast("long") - 1L + phase, lit(numShards.toLong)))
      .drop("graft_sub")
  }

  /** Per-shard totals over an assignment — the balance report a pipeline
    * operator reads before kicking off training (map-side partial agg;
    * only (shard, counters) rows shuffle). */
  def shardStats(assigned: DataFrame, weightCol: String): DataFrame =
    assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col(weightCol)).as("total_weight"))

  /** Seeded epoch shuffle — the reproducible global training-order
    * permutation every trainer feed ends with: sequential reads of a
    * crawl-ordered corpus would feed the model one domain / one time
    * slice at a time (catastrophic for optimization), so the export is
    * read in a pseudorandom order that (a) is byte-identical for the same
    * seed — restarts and data-ablation reruns see the SAME order — and
    * (b) changes completely with the seed, giving each epoch a fresh
    * permutation without rewriting a byte of payload.
    *
    * Order key = md5(seed ‖ ':' ‖ id): deterministic, engine-portable
    * (the oracle replays it), uncorrelated with id or any crawl ordering.
    * Shard = leading-32-bit window of the same key mod `numShards`; the
    * within-shard position is dense row_number over the key. A trainer
    * reads shards in any interleave; per-shard order is the contract.
    *
    * Scale shape: ONE hash Exchange on the shard key plus an in-partition
    * sort — exactly the write layout (`repartition(shard).sortWithin`)
    * the export stage produces anyway, so the permutation is free at
    * write time. `numShards` at 100 TB is O(10^5) (1 GB shards): far
    * above any cluster's core count, so the per-shard window never
    * funnels. The global sort this op deliberately avoids would be a
    * range exchange over the full corpus for an order nobody reads
    * globally.
    */
  /** [[epochOrder]] with a CURRICULUM dimension: positions are assigned
    * within `(tier, shard)` instead of `shard`, so a trainer consumes the
    * tier groups in quality order (highest first — the curriculum-
    * learning schedule: clean text before tail scrapings) while each
    * tier's internal order stays the reproducible seeded permutation and
    * each tier still fans out over `numShards` parallel readers. Same
    * seed → byte-identical schedule; changing only the seed reshuffles
    * WITHIN tiers without moving any document across tiers.
    *
    * Scale shape: identical to [[epochOrder]] — one `(tier, shard)`
    * exchange + in-partition sort; tiers are few (3–5), so the shard
    * fan-out still dominates parallelism and no window is global.
    */
  def curriculumOrder(d: DataFrame, idCol: String, tierCol: String,
                      seed: Long, numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val key = md5(concat_ws(":", lit(seed.toString), col(idCol).cast("string")))
    val shard = pmod(conv(substring(col("graft_okey"), 1, 8), 16, 10).cast("long"),
      lit(numShards.toLong))
    val w = Window.partitionBy(col(tierCol), col("shard"))
      .orderBy(col("graft_okey"), col(idCol))
    d.withColumn("graft_okey", key)
      .withColumn("shard", shard)
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("graft_okey")
  }

  def epochOrder(d: DataFrame, idCol: String, seed: Long, numShards: Int): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val key = md5(concat_ws(":", lit(seed.toString), col(idCol).cast("string")))
    val shard = pmod(conv(substring(col("graft_okey"), 1, 8), 16, 10).cast("long"),
      lit(numShards.toLong))
    val w = Window.partitionBy(col("shard")).orderBy(col("graft_okey"), col(idCol))
    d.withColumn("graft_okey", key)
      .withColumn("shard", shard)
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("graft_okey")
  }
}
