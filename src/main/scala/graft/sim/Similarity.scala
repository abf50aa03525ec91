package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`):
  * brute-force top-k as the exact baseline, and an LSH-bucketed
  * (random-hyperplane) approximate variant as the scale path.
  *
  * All scoring is `zip_with`/`aggregate` higher-order expressions — no
  * UDFs, stays in codegen. Scale design: the query side is small and
  * explicitly `broadcast()`; brute force is a broadcast nested loop
  * (embarrassingly parallel, no shuffle of the corpus); the LSH variant
  * replaces the full scan with an equi-join on a bucket signature so the
  * corpus shuffles once by bucket instead of being scanned per query.
  */
object Similarity {

  /** Exact double-precision dot product (index order — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (s, v) => s + v)

  /** Quantized integer dot product: components floored to 1/scale grid,
    * accumulated in Long — bit-exact across engines (oracle-checkable),
    * and a faithful stand-in for int8-quantized ANN scoring.
    */
  def dotQuantized(a: Column, b: Column, scale: Int = 1000): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        floor(x.cast("double") * scale).cast("long") * floor(y.cast("double") * scale).cast("long")),
      lit(0L), (s, v) => s + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k by `scoreFn` for each query vector: broadcast the
    * (small) query side, score the corpus in place, keep k per query via a
    * window. Ties break on vid — fully deterministic.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      scoreFn: (Column, Column) => Column = dotQuantized(_, _)
  ): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"), col("embedding").as("qe")))
    val v = corpus.select(col("vec_id").as("vid"), col("embedding").as("ve"))
    val scored = v.join(q, col("qid") =!= col("vid"))
      .select(col("qid"), col("vid"), scoreFn(col("qe"), col("ve")).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("vid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Deterministic pseudo-random hyperplanes (no RNG state — pure
    * arithmetic on (plane, component), reproducible at any parallelism).
    */
  def hyperplanes(numPlanes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(numPlanes, dim) { (p, j) =>
      val h = (p * 1315423911L + j * 2654435761L + 97531L) % 1000003L
      (h.toDouble / 1000003.0) * 2.0 - 1.0
    }

  /** Sign-bucket signature: bit p set iff dot(e, plane_p) > 0. */
  def lshSignature(e: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, idx) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(e, planeCol) > 0, lit(1 << idx)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Embedding near-duplicate pairs (the embedding-cosine dedup op): all
    * pairs (id1 < id2) whose QUANTIZED dot product reaches `minQDot`.
    * Inputs are unit-norm embeddings, so quantized-dot ≈ cosine × scale².
    * Integer scoring keeps the op oracle-exact across engines. This is the
    * exact baseline; at corpus scale generate candidates with
    * [[nearDupPairsLsh]] instead of the full self-join.
    */
  /** Codegen'd quantized dot via the native `graft_qdot` expression
    * (scale fixed at 1000) — semantics identical to [[dotQuantized]]; the
    * interpreted HOF is prohibitive at pairwise-join row counts.
    */
  def qdotNative(df: DataFrame)(a: Column, b: Column): Column = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    call_function(graft.functions.GraftFunctions.QDotName, a, b)
  }

  def nearDupPairs(corpus: DataFrame, minQDot: Long): DataFrame = {
    val qdot = qdotNative(corpus) _
    val a = corpus.select(col("vec_id").as("id1"), col("embedding").as("e1"))
    val b = corpus.select(col("vec_id").as("id2"), col("embedding").as("e2"))
    a.join(b, col("id1") < col("id2"))
      .select(col("id1"), col("id2"), qdot(col("e1"), col("e2")).as("qdot"))
      .filter(col("qdot") >= minQDot)
  }

  /** Scale path for [[nearDupPairs]]: LSH sign-bucket candidates first,
    * then the exact quantized-dot verify — same output contract, but the
    * corpus shuffles once by bucket instead of self-joining in full.
    * Approximate: pairs whose members land in different buckets are missed
    * (recall grows with fewer planes).
    */
  def nearDupPairsLsh(corpus: DataFrame, minQDot: Long, numPlanes: Int = 4, dim: Int = 64): DataFrame = {
    val qdot = qdotNative(corpus) _
    val planes = hyperplanes(numPlanes, dim)
    val sig = corpus.select(col("vec_id"), col("embedding"),
      lshSignature(col("embedding"), planes).as("sig"))
    val a = sig.select(col("sig"), col("vec_id").as("id1"), col("embedding").as("e1"))
    val b = sig.select(col("sig"), col("vec_id").as("id2"), col("embedding").as("e2"))
    // no distinct needed: each vector has exactly one signature, so a pair
    // can collide on at most one bucket — dedup would be a wasted shuffle
    a.join(b, Seq("sig")).filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), qdot(col("e1"), col("e2")).as("qdot"))
      .filter(col("qdot") >= minQDot)
  }

  /** LSH-bucketed approximate top-k: candidates = same-bucket vectors,
    * ranked by exact cosine. At corpus scale the signature is computed in
    * the scan projection and the bucket join shuffles each vector once;
    * skewed buckets are ordinary hot join keys (AQE skew-split applies).
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int, numPlanes: Int = 4, dim: Int = 64): DataFrame = {
    val planes = hyperplanes(numPlanes, dim)
    val q = broadcast(
      queries.select(col("vec_id").as("qid"), col("embedding").as("qe"),
        lshSignature(col("embedding"), planes).as("sig")))
    val v = corpus.select(col("vec_id").as("vid"), col("embedding").as("ve"),
      lshSignature(col("embedding"), planes).as("sig"))
    val scored = v.join(q, Seq("sig")).filter(col("qid") =!= col("vid"))
      .select(col("qid"), col("vid"), cosine(col("qe"), col("ve")).as("score"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("vid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }
}
