package graft

import graft.job.{ExtractJob, ExtractKernel}
import graft.pages.PagesGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main. Prints ONE compact JSON line (stdout) with:
  *  - the headline extraction throughput (docs/sec, full kernel, forced
  *    materialization of `extracted_text`);
  *  - the north_rule scaling evidence: the SAME job on the SAME input at
  *    two parallelism levels (local[N] vs local[4N] — the sandbox analog
  *    of N vs 4N executors), efficiency = thr(4N) / (4 × thr(N)) — at
  *    TWO level pairs per run: the committed 2→8 pairs (per-executor
  *    memory-headroom analog) and the high-core 8→32 pairs
  *    (`scaling_hi`; memory-bandwidth + GC contention at full occupancy,
  *    what a 100×-scale executor feels), each with its own clean-pair
  *    exclusion and raw/min-ratio/hw-normalized figures;
  *  - op-suite summary (count, ok count, total seconds, 3 slowest) +
  *    the error list for the SparkEntry op suite;
  *  - approximation quality (ANN recall@5, near-dup LSH recall).
  * Per-run/per-pair telemetry (the `runs` array, per-pair steal, raw
  * efficiency samples) AND the full per-query timing map go to a sidecar
  * file (`detail_file` in the output; default ./bench_detail.json) so the
  * stdout line stays FIXED-SIZE for log-tail capture (the runs array
  * overran the capture in r2, the grown query map in r3).
  *
  * HONESTY CONTRACT for the headline: `efficiency` is computed ONLY from
  * pairs that survived the exclusion telemetry. If fewer than 2 clean
  * pairs exist after the base pairs, the bench cools down and measures
  * extra pairs (up to `SPARK_GRAFT_BENCH_MAX_PAIRS`, within the
  * deadline); if the window stays dirty it publishes
  * `efficiency: null, contended: true` — a median of samples the bench
  * itself classified as measuring the neighbors is noise, never signal.
  * `efficiency_hw_normalized` is likewise null unless the measured
  * occupancy inflation is within the documented hardware range (≤ 1.6):
  * interference-driven inflation × a contended ratio can multiply into an
  * accidentally-plausible number.
  *
  * Measurement methodology (each element exists because its absence was a
  * measured bias — see BASELINE.md "Measurement noise"):
  *  - sessions are created and stopped sequentially so each level owns the
  *    machine; each session gets a JIT/IO warmup slice; `System.gc()`
  *    between sessions resets heap aging.
  *  - the two levels run as INTERLEAVED pairs so JVM aging is shared;
  *    efficiency is the MEDIAN of per-pair ratios; pairs measured while
  *    the hypervisor stole > 2 % of cycles are excluded.
  *  - STALL DETECTION (the round-1 gap): BENCH_r01 recorded pair ratios of
  *    0.097 and 4.31 at near-zero steal — individual runs were slowed
  *    4-7× by interference steal% does not see. Root-caused (r02) with
  *    per-run process-CPU telemetry to TWO distinct modes:
  *      (a) descheduling — the JVM stops getting CPU: wall inflates,
  *          `cpu_util = cpuTime / (wall × cores)` collapses;
  *      (b) IPC collapse — a neighbor saturates the shared memory bus:
  *          instructions retire slowly, the JVM stays "busy", so BOTH
  *          wall AND CPU-seconds inflate at normal cpu_util (measured:
  *          a 269.9 s run burning 5.4× the CPU-seconds of the 60.5 s
  *          clean run of the same work, at 1.28 % steal).
  *    Detection: a run is stalled if cpu_util < [[UtilFloor]] (mode a) OR
  *    its CPU-seconds exceed [[CpuSecStallFactor]] × the smallest
  *    CPU-seconds yet observed for its level (same work ⇒ same healthy
  *    CPU budget; mode b, and also catches first-run JIT inflation, which
  *    a retry then measures warm). Stalled runs are re-run (≤ 2 retries,
  *    fastest attempt stands); a pair whose best run is still
  *    CPU-inflated is excluded like a high-steal pair. All attempts are
  *    reported in `runs` for scrutiny.
  *  - fixed per-job cost (range-sampling pass, scheduling, final agg;
  *    ~4-5 s at either level) must amortize: at 1.5M docs it alone caps
  *    measured efficiency at ~0.63, at 3M docs ≤ ~0.07 of the ratio —
  *    the default corpus is 3M pages (replicate 600).
  *  - a pure-CPU probe records the host's own core-scaling factor in the
  *    same window (`host_cpu_scaling` — context, never applied).
  */
object Bench {

  /** cpu_util below this marks a run as descheduled (healthy runs measure
    * ≈0.65-0.95 at both levels; descheduled runs back-compute to ≈0.1-0.2).
    */
  val UtilFloor = 0.5

  /** A run burning more than this × the level's minimum CPU-seconds did
    * the same work against a contended memory system (or cold JIT) — its
    * wall time measures the neighbors, not this software.
    */
  val CpuSecStallFactor = 1.35
  val MaxAttempts = 3

  /** Soft wall-clock budget for the scaling phase: once exceeded, stall
    * retries are skipped (pairs still complete, the exclusion logic still
    * applies) — bounds total bench time on a badly contended host, where
    * each retry of a stalled run can cost minutes.
    */
  val retryDeadline: Long =
    System.nanoTime() + sys.env.getOrElse("SPARK_GRAFT_BENCH_DEADLINE_SEC", "2400").toLong * 1000000000L

  private def session(cores: Int): SparkSession = {
    // shuffle spill on tmpfs when available: disk I/O variance at high
    // core counts otherwise dominates the scaling measurement
    val localDir = {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) "/dev/shm/graft-spark-bench" else null
    }
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val s = (if (localDir != null) b.config("spark.local.dir", localDir) else b).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  // ------------------------------------------------------------ telemetry

  private def processCpuSec(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime / 1e9
      case _ => -1.0
    }

  private def gcMsNow(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(0L, b.getCollectionTime)).sum
  }

  /** (steal, total) jiffies from /proc/stat — evidence of noisy-neighbor
    * interference during the measurement window (shared host).
    */
  private def procStat(): (Long, Long) =
    try {
      val f = scala.io.Source.fromFile("/proc/stat")
      val vals = try f.getLines().next().split("\\s+").drop(1).map(_.toLong) finally f.close()
      (if (vals.length > 7) vals(7) else 0L, vals.sum)
    } catch { case _: Exception => (0L, 0L) }

  private def stealSince(before: (Long, Long)): Double = {
    val now = procStat()
    val dt = now._2 - before._2
    if (dt <= 0) 0.0 else 100.0 * (now._1 - before._1) / dt
  }

  final case class Run(cores: Int, sec: Double, cpuUtil: Double, gcMs: Long, stealPct: Double) {
    /** CPU-seconds consumed — the work's CPU budget; stable for identical
      * work on an uncontended memory system, inflated under IPC collapse.
      */
    def cpuSec: Double = if (cpuUtil < 0) -1.0 else cpuUtil * sec * cores
  }

  /** Smallest healthy CPU-seconds observed per level across the whole
    * bench — the reference "CPU budget" the stall detector compares against.
    */
  private val minCpuSec = scala.collection.mutable.Map.empty[Int, Double]

  private def noteCpuSecValue(cores: Int, v: Double): Unit =
    if (v > 0) minCpuSec.updateWith(cores) {
      case Some(m) => Some(math.min(m, v))
      case None => Some(v)
    }

  private def noteCpuSec(r: Run): Unit = noteCpuSecValue(r.cores, r.cpuSec)

  /** Stalled = descheduled (low util) or CPU-inflated vs the level's
    * observed minimum budget.
    */
  def stalled(r: Run): Boolean =
    (r.cpuUtil >= 0 && r.cpuUtil < UtilFloor) ||
      minCpuSec.get(r.cores).exists(m => r.cpuSec > CpuSecStallFactor * m)

  // ---------------------------------------------------------- measurement

  /** One full extraction pass; returns (rows, telemetry). Forces every
    * extracted_text to materialize (sum of lengths — nothing short-circuits
    * the kernel). Partitions = 8× cores; giant documents (~25× kernel
    * cost, ~1% of rows) condense into the FIRST few heavy partitions
    * (LPT order — see ExtractJob.partitionForExtraction), so their work
    * overlaps the small-row waves instead of forming a straggler tail.
    */
  private def timedExtract(spark: SparkSession, sfDir: String, cores: Int, replicate: Int): (Long, Run) = {
    val pages = PagesGen.pages(spark, sfDir, cores * 8, replicate)
    val res = ExtractJob.extractAll(pages, ExtractKernel.DefaultRules, "bench")
    val steal0 = procStat(); val cpu0 = processCpuSec(); val gc0 = gcMsNow()
    val t0 = System.nanoTime()
    val row = res.toDF()
      .agg(count(lit(1)), sum(length(coalesce(col("extracted_text"), lit("")))))
      .collect()(0)
    val wall = (System.nanoTime() - t0) / 1e9
    val util = if (cpu0 < 0) -1.0 else (processCpuSec() - cpu0) / (wall * cores)
    (row.getLong(0), Run(cores, wall, util, gcMsNow() - gc0, stealSince(steal0)))
  }

  /** Measure one level: warmup, then a timed run with stall retry — a
    * [[stalled]] run (descheduled or CPU-inflated) is re-run
    * (≤ [[MaxAttempts]] total) and the fastest attempt stands.
    * Returns (docs, best run, all attempts).
    */
  private def extractAtCores(cores: Int, sfDir: String, replicate: Int): (Long, Run, Vector[Run]) = {
    val spark = session(cores)
    try {
      // warmup: a full (smaller) pass through the identical pipeline —
      // JIT-compiles the whole kernel + shuffle path, not just a slice,
      // so first-pair runs don't carry compilation CPU. Its CPU-seconds,
      // scaled by the workload ratio, seed the level's stall-detection
      // budget: without this the FIRST timed run of a level has no
      // reference and a contended first run silently passes (the scaled
      // estimate overshoots — warmup carries proportionally more fixed
      // cost + residual JIT — so it only catches gross stalls; real runs
      // then tighten the minimum).
      val warmRepl = math.max(1, replicate / 10)
      val (_, warm) = timedExtract(spark, sfDir, cores, warmRepl)
      noteCpuSecValue(cores, warm.cpuSec * (replicate.toDouble / warmRepl))
      var (docs, best) = timedExtract(spark, sfDir, cores, replicate)
      val attempts = Vector.newBuilder[Run]
      attempts += best
      var n = 1
      while (n < MaxAttempts && stalled(best) && System.nanoTime() < retryDeadline) {
        val (_, r) = timedExtract(spark, sfDir, cores, replicate)
        attempts += r
        noteCpuSec(r)
        if (r.sec < best.sec) best = r
        n += 1
      }
      noteCpuSec(best)
      (docs, best, attempts.result())
    } finally {
      spark.stop()
      System.gc() // heap reset: each session starts from the same aging state
    }
  }

  /** Pure-CPU probe: aggregate hash throughput with `threads` concurrent
    * workers (~1.5 s), measuring the HOST's own core-scaling in the same
    * time window as the Spark runs (shared silicon, neighbor load). When
    * `host_cpu_scaling` in the output is well below 1.0, even perfect
    * software could not measure linear on this box in that window. It is
    * REPORTED as context, not applied to the efficiency figure.
    */
  private def cpuProbe(threads: Int): Double = {
    val iters = 150000
    val done = new java.util.concurrent.CountDownLatch(threads)
    val t0 = System.nanoTime()
    (1 to threads).foreach { _ =>
      val t = new Thread(() => {
        val md = java.security.MessageDigest.getInstance("MD5")
        val buf = new Array[Byte](1024)
        var i = 0
        while (i < iters) { md.update(buf); md.digest(); i += 1 }
        done.countDown()
      })
      t.setDaemon(true)
      t.start()
    }
    done.await()
    threads.toDouble * iters / ((System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default N=2 (local[2] → local[8]): the committed level pair. On this
    // 32-core box, 8 threads leave the most per-thread memory-system
    // headroom, so 2→8 is the single-box configuration that most
    // faithfully mirrors adding EXECUTORS (each executor node brings its
    // own memory controllers); measured occupancy inflation at 2→8 with
    // the 6M corpus is ~1.0–1.1 (vs ×1.25 at 4→16, which caps RAW
    // efficiency at ~0.8 by silicon alone, and ×1.5 at 8→32). BASELINE.md
    // tabulates the full 2→8 / 4→16 / 8→32 curve with the hardware
    // normalization story.
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "2").toInt
    // 1200 × sf0.1 = 6M pages: the fixed per-job cost (range-sampling
    // pass, scheduling, final agg) must sit well below the level-N wall
    // time or it caps the measurable efficiency (at 1.5M docs it alone
    // bounded the ratio at ~0.63; at 6M it is ≤ ~0.03 of the ratio)
    val replicate = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPL", "1200").toInt
    val n4 = 4 * n

    // scaling runs: the two parallelism levels ALTERNATE as pairs —
    // interleaving equalizes JVM age (JIT, heap expansion) across levels;
    // per-pair steal telemetry + stall retries + the median estimator
    // handle the shared-host noise (see class doc + BASELINE.md)
    val stealBefore = procStat()
    // 4 pairs at the committed config (each 2→8 pair costs ~5-6 min at 6M
    // docs); the contended-window recovery below adds pairs when needed
    val numPairs = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAIRS", "4").toInt
    // contended-window recovery: if the base pairs leave < 2 clean samples,
    // keep measuring (cooldown, then another pair) until two clean pairs
    // exist, the pair cap is hit, or the deadline passes — measured
    // contention windows on this host pass in minutes, so a retried pair
    // regularly lands clean
    val maxPairs = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_PAIRS", "8").toInt
    val cooldownSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_COOLDOWN_SEC", "20").toInt
    case class Pair(docs: Long, runN: Run, runN4: Run, probe: Double, stealPct: Double)
    val allRuns = Vector.newBuilder[Run]
    def runPair(nn: Int): Pair = {
      val pairStat = procStat()
      val probeN = cpuProbe(nn)
      val (d, bestN, runsN) = extractAtCores(nn, sfDir, replicate)
      val probeN4 = cpuProbe(4 * nn)
      val (_, bestN4, runsN4) = extractAtCores(4 * nn, sfDir, replicate)
      allRuns ++= runsN; allRuns ++= runsN4
      Pair(d, bestN, bestN4, probeN4 / (4.0 * probeN), stealSince(pairStat))
    }
    var pairs = (1 to numPairs).map(_ => runPair(n)).toVector
    val docs = pairs.head.docs
    // true median: even-length input averages the two middles — taking the
    // upper-middle would systematically pick the better sample when the
    // steal filter leaves an even number of clean pairs
    def median(v: Seq[Double]): Double = {
      val s = v.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    // efficiency from PER-PAIR ratios (temporally adjacent measurements);
    // a pair is excluded (when enough clean pairs remain) if either of its
    // BEST runs saw > StealCutPct hypervisor steal in its own window, or
    // is still CPU-inflated against the bench-global minimum CPU budget
    // for its level (contention the in-pair retries could not escape) —
    // both modes measure the NEIGHBORS, not this software. The exclusion
    // judges the best runs' OWN windows, not the whole pair window: a pair
    // whose first attempt stalled but whose retry ran clean is exactly the
    // case the retries exist for. Every sample + the pair-window steal is
    // still reported.
    val StealCutPct = 2.0
    def cpuInflated(r: Run): Boolean =
      minCpuSec.get(r.cores).exists(m => r.cpuSec > CpuSecStallFactor * m)
    def pairContended(p: Pair): Boolean =
      p.runN.stealPct > StealCutPct || p.runN4.stealPct > StealCutPct ||
        cpuInflated(p.runN) || cpuInflated(p.runN4)
    // fewer than 2 clean base pairs → cooldown and measure more (see above)
    while (pairs.count(!pairContended(_)) < 2 && pairs.size < maxPairs
        && System.nanoTime() < retryDeadline) {
      Thread.sleep(cooldownSec * 1000L)
      pairs :+= runPair(n)
    }
    // HIGH-CORE scaling pairs (default 8→32): the committed 2→8 pairs
    // mirror per-executor memory headroom; 8→32 is the harder claim —
    // memory-bandwidth and GC contention appear at high occupancy, which
    // is what a 100×-scale executor feels. Same pair machinery, same
    // exclusion telemetry, published under "scaling_hi" whatever it
    // measures (the honest number is the deliverable; raw vs
    // hw-normalized bracket the silicon penalty, ~×1.5 at 8→32).
    val nHi = sys.env.getOrElse("SPARK_GRAFT_BENCH_N_HI", "8").toInt // 0 disables
    val numPairsHi = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAIRS_HI", "2").toInt
    var hiPairs =
      if (nHi > 0) (1 to numPairsHi).map(_ => runPair(nHi)).toVector
      else Vector.empty[Pair]
    while (nHi > 0 && hiPairs.count(!pairContended(_)) < 2
        && hiPairs.size < numPairsHi + 2 && System.nanoTime() < retryDeadline) {
      Thread.sleep(cooldownSec * 1000L)
      hiPairs :+= runPair(nHi)
    }
    val stealPct = stealSince(stealBefore) // whole scaling-phase window
    // Per-level-pair statistics, shared by the committed 2→8 pairs and
    // the high-core 8→32 pairs:
    //  - a window where < 2 pairs survived exclusion yields NO efficiency
    //    figure: averaging pairs the telemetry itself classified as
    //    measuring the neighbors would publish noise as signal
    //    (BENCH_r02's 0.044) — the artifact says contended=true,
    //    efficiency=null instead;
    //  - effMin: fastest clean N over 4× fastest clean 4N — slow-drift
    //    contention below the stall threshold inflates ONE half of a pair
    //    (a 2-core run absorbing ~20 % background load still passes the
    //    1.35× CPU-budget check), biasing pair ratios either direction;
    //    best-vs-best pairs the two least-contended samples. Both figures
    //    are published; they bracket the truth;
    //  - cpuInflation: full-occupancy hardware penalty — identical work
    //    burns MORE CPU-seconds at 4N concurrent threads than at N on
    //    shared silicon (all-core turbo, DRAM/LLC contention); 1.0 on
    //    separate nodes. effHw = what the same software would measure
    //    where per-instruction cost is flat across levels (a cluster
    //    whose 4N executors bring 4× the memory systems). Reported
    //    alongside the raw figure, never substituted — and NULLED when
    //    measured inflation exceeds the documented occupancy range
    //    (≤ 1.6 at 8→32 threads): interference-driven inflation × a
    //    contended ratio can multiply into an accidentally-plausible
    //    number (BENCH_r02's 0.998).
    val MaxCredibleInflation = 1.6
    case class LevelStats(contended: Boolean, secN: Double, secN4: Double,
        eff: Option[Double], effMin: Option[Double],
        cpuInflation: Option[Double], effHw: Option[Double], clean: Int)
    def levelStats(ps: Vector[Pair]): LevelStats = {
      val cleanPs = ps.filterNot(pairContended)
      val contended = cleanPs.size < 2
      val base = if (contended) ps else cleanPs // throughput context only
      val secN = median(base.map(_.runN.sec))
      val secN4 = median(base.map(_.runN4.sec))
      val eff: Option[Double] =
        if (contended) None
        else Some(median(cleanPs.map(p => p.runN.sec / (4.0 * p.runN4.sec))))
      val effMin: Option[Double] =
        if (contended) None
        else Some(cleanPs.map(_.runN.sec).min / (4.0 * cleanPs.map(_.runN4.sec).min))
      val cpuInflation: Option[Double] = {
        val ratios = cleanPs.collect {
          case p if p.runN.cpuSec > 0 && p.runN4.cpuSec > 0 => p.runN4.cpuSec / p.runN.cpuSec
        }
        if (contended || ratios.isEmpty) None else Some(median(ratios))
      }
      val effHw: Option[Double] = (eff, cpuInflation) match {
        case (Some(e), Some(i)) if i <= MaxCredibleInflation => Some(e * i)
        case _ => None
      }
      LevelStats(contended, secN, secN4, eff, effMin, cpuInflation, effHw, cleanPs.size)
    }
    val st = levelStats(pairs)
    val contended = st.contended
    val secN = st.secN
    val secN4 = st.secN4
    val thrN = docs / secN
    val thrN4 = docs / secN4
    val allEffs = pairs.map(p => p.runN.sec / (4.0 * p.runN4.sec))
    val eff = st.eff
    val effMinRatio = st.effMin
    val statsBase = if (contended) pairs else pairs.filterNot(pairContended)
    val hostScaling = median(statsBase.map(_.probe)) // 1.0 = host cores scale linearly
    val cpuInflation = st.cpuInflation
    val effHwNormalized = st.effHw

    // op-suite timings at full parallelism — failures are RECORDED, never
    // swallowed: a throwing query gets an error entry and fails the exit
    val spark = session(n4)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).collect(); None }
        catch { case e: Throwable => Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}") }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    // approximation quality at this sf (VERDICT r01 §missing-3: a user must
    // know what the ANN approximation costs)
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // the GATED configuration: planes from planesFor(count), 4 tables,
    // Hamming-2 probes — recall is measured at the sf the bench publishes
    val annPlanes = graft.sim.Similarity.planesFor(embs.count())
    val annRecall = graft.sim.Similarity.annRecallAtK(
      embs, embs.filter(col("vec_id") < 10), 5,
      numPlanes = annPlanes, probeHamming = 2, numTables = 4)
    // IVF twin of the same measurement (gated config: √n cells, 4 probes,
    // one Lloyd refinement round)
    val ivfCells = graft.sim.Similarity.cellsFor(embs.count())
    val ivfRecall = graft.sim.Similarity.ivfRecallAtK(
      embs, embs.filter(col("vec_id") < 10), 5, numCells = ivfCells, nProbe = 4,
      lloydRounds = 1)
    val ndCorpus = embs.filter(col("vec_id") < 1000)
    val ndExact = graft.sim.Similarity.nearDupPairs(ndCorpus, 400000L).count()
    val ndLsh = graft.sim.Similarity.nearDupPairsLsh(ndCorpus, 400000L).count()
    val ndRecall = if (ndExact == 0) 1.0 else ndLsh.toDouble / ndExact
    // PQ ADC recall at the gated (m, ks) — the memory-resident scan's
    // distortion is a per-run quality number, like the other two ANN paths
    val pqRecall = graft.sim.Similarity.pqRecallAtK(
      embs, embs.filter(col("vec_id") < 10), 5, m = 16, ks = 64)
    // IVF-PQ composite at BOTH gated configs — the residual-encoding
    // baseline and the refine-stage (exact-rerank) config that holds
    // ≥ 0.9 — published next to flat PQ so the trade is visible
    val ivfPqRecall = graft.sim.Similarity.ivfPqRecallAtK(
      embs, embs.filter(col("vec_id") < 10), 5,
      numCells = ivfCells, nProbe = 4, m = 16, ks = 64)
    val ivfPqRerankRecall = graft.sim.Similarity.ivfPqRerankRecallAtK(
      embs, embs.filter(col("vec_id") < 10), 5,
      numCells = ivfCells, nProbe = 8, m = 16, ks = 64, shortlist = 50)
    spark.stop()

    import graft.util.JsonFmt.d
    def js(s: String): String = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def dOpt(o: Option[Double], dec: Int): String = o.map(d(_, dec)).getOrElse("null")
    val qs = queries.map { case (k, v, _) => s""""$k":${d(v, 3)}""" }.mkString("{", ",", "}")
    val qErrs = queries.collect { case (k, _, Some(e)) => s"""{"query":${js(k)},"error":${js(e)}}""" }
      .mkString("[", ",", "]")
    val runsJson = allRuns.result().map(r =>
      s"""{"cores":${r.cores},"sec":${d(r.sec, 3)},"cpu_util":${d(r.cpuUtil, 3)},"gc_ms":${r.gcMs},"steal_pct":${d(r.stealPct, 2)}}"""
    ).mkString("[", ",", "]")
    val total = secN4 + queries.map(_._2).sum
    val slowest = queries.sortBy(-_._2).take(3)
      .map { case (k, v, _) => s"""{"query":${js(k)},"sec":${d(v, 3)}}""" }.mkString("[", ",", "]")

    // per-run/per-pair telemetry AND the per-query timing map go to a
    // SIDECAR file: both grow with the suite (the runs array overran the
    // driver's stdout tail capture in r2, the 86-entry query map did the
    // same in r3 — both times "parsed": null). The stdout headline is
    // FIXED-SIZE: summary counters + the 3 slowest queries + the error
    // list (empty on a healthy run; a run with many errors fails the exit
    // code anyway).
    val detailFile = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "bench_detail.json")).getAbsoluteFile
    val detail =
      s"""{"sf":"$sfDir","cores_n":$n,"cores_4n":$n4,"replicate":$replicate,"queries":$qs,"efficiency_samples":[${allEffs.map(d(_, 3)).mkString(",")}],"pair_steal_pct":[${pairs.map(p => d(p.stealPct, 2)).mkString(",")}],"pair_excluded":[${pairs.map(pairContended).mkString(",")}],"efficiency_samples_hi":[${hiPairs.map(p => d(p.runN.sec / (4.0 * p.runN4.sec), 3)).mkString(",")}],"pair_steal_pct_hi":[${hiPairs.map(p => d(p.stealPct, 2)).mkString(",")}],"pair_excluded_hi":[${hiPairs.map(pairContended).mkString(",")}],"runs":$runsJson,"util_floor":${d(UtilFloor, 2)},"cpusec_stall_factor":${d(CpuSecStallFactor, 2)},"host_cpu_scaling":${d(hostScaling, 3)},"cpu_steal_pct":${d(stealPct, 2)}}"""
    java.nio.file.Files.write(detailFile.toPath, (detail + "\n").getBytes("UTF-8"))

    val scaling =
      s""""cores_n":$n,"cores_4n":$n4,"sec_n":${d(secN, 3)},"sec_4n":${d(secN4, 3)},"docs_per_sec_n":${d(thrN, 1)},"docs_per_sec_4n":${d(thrN4, 1)},"pairs_total":${pairs.size},"clean_pairs":${st.clean},"contended":$contended,"cpu_occupancy_inflation":${dOpt(cpuInflation, 3)},"efficiency_hw_normalized":${dOpt(effHwNormalized, 3)},"efficiency_min_ratio":${dOpt(effMinRatio, 3)},"detail_file":${js(detailFile.toString)},"efficiency":${dOpt(eff, 3)}"""
    val scalingHi =
      if (hiPairs.isEmpty) "null"
      else {
        val h = levelStats(hiPairs)
        s"""{"cores_n":$nHi,"cores_4n":${4 * nHi},"sec_n":${d(h.secN, 3)},"sec_4n":${d(h.secN4, 3)},"docs_per_sec_n":${d(docs / h.secN, 1)},"docs_per_sec_4n":${d(docs / h.secN4, 1)},"pairs_total":${hiPairs.size},"clean_pairs":${h.clean},"contended":${h.contended},"cpu_occupancy_inflation":${dOpt(h.cpuInflation, 3)},"efficiency_hw_normalized":${dOpt(h.effHw, 3)},"efficiency_min_ratio":${dOpt(h.effMin, 3)},"efficiency":${dOpt(h.eff, 3)}}"""
      }
    println(
      s"""{"metric":"total","value":${d(total, 3)},"unit":"sec","queries_total":${queries.size},"queries_ok":${queries.count(_._3.isEmpty)},"queries_sec":${d(queries.map(_._2).sum, 3)},"queries_slowest":$slowest,"query_errors":$qErrs,"sf":"$sfDir","extract":{"docs":$docs,"docs_per_sec":${d(thrN4, 1)},"sec":${d(secN4, 3)}},"quality":{"ann_planes":$annPlanes,"ann_recall_at_5":${d(annRecall, 3)},"ivf_cells":$ivfCells,"ivf_recall_at_5":${d(ivfRecall, 3)},"pq_recall_at_5":${d(pqRecall, 3)},"ivfpq_recall_at_5":${d(ivfPqRecall, 3)},"ivfpq_rerank_recall_at_5":${d(ivfPqRerankRecall, 3)},"neardup_lsh_recall":${d(ndRecall, 3)},"neardup_pairs_exact":$ndExact,"neardup_pairs_lsh":$ndLsh},"scaling":{$scaling},"scaling_hi":$scalingHi}"""
    )
    if (queries.exists(_._3.isDefined)) sys.exit(1)
  }
}
