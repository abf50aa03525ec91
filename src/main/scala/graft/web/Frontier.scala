package graft.web

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier POLITENESS SCHEDULING: turn a batch of pending urls into
  * a fetch plan that (a) pins every host to exactly ONE fetcher worker —
  * the politeness invariant, since per-host rate limiting is impossible if
  * two workers share a host — (b) sequences a host's urls in a
  * deterministic fair order (md5 hash order, so no crawl-list prefix bias
  * decides who fetches first), and (c) assigns each url the earliest slot
  * respecting the per-host delay: url k of a host fetches at offset
  * `k · perHostDelayMs`. This is the scheduling step between frontier
  * dedup (the anti-join family) and the fetcher fleet; the reference's
  * semaphore-bounded batch (`/root/reference/src/core/batch.py:90-101`)
  * is the single-process ancestor of exactly this.
  *
  * Scale shape: ONE exchange on the host key shared by the window rank;
  * worker pinning is a map-side hash — no shuffle. Hosts are the natural
  * partitioner at 10^10 pending urls, and a mega-host cannot funnel the
  * plan: its urls still sort only within their own partition. Worker and
  * ordering hashes use disjoint md5 windows (chars 1–8 vs 9–24, the
  * [[graft.sample.Sampler]] discipline) so host→worker assignment cannot
  * correlate with within-host ordering; both are engine-portable
  * (DuckDB oracle replays them exactly).
  */
object Frontier {

  /** Fetch plan: (url, host, worker, seq_in_host, fetch_offset_ms).
    * `urls` must carry `urlCol`; the host is derived canonically
    * ([[UrlOps.host]]).
    *
    * `tieCols` MUST make rows unique when the input can carry duplicate
    * urls (a frontier that hasn't url-deduped yet — re-crawl batches, or
    * distinct pages whose synthesized urls collide): with duplicates the
    * `(md5(url), url)` sort key ties and `row_number` becomes
    * partition-order-dependent — nondeterministic across engines and
    * runs. Passing the row's unique id restores a total order.
    */
  def schedule(urls: DataFrame, urlCol: String, numWorkers: Int,
               perHostDelayMs: Long, tieCols: Seq[String] = Nil): DataFrame = {
    require(numWorkers >= 1, s"numWorkers must be positive, got $numWorkers")
    require(perHostDelayMs >= 0, s"perHostDelayMs must be non-negative, got $perHostDelayMs")
    val withHost = urls.withColumn("host", UrlOps.host(col(urlCol)))
    val worker =
      expr(s"CAST(conv(substring(md5(host), 1, 8), 16, 10) AS BIGINT) % ${numWorkers}L")
    val w = Window.partitionBy(col("host"))
      .orderBy(substring(md5(col(urlCol)), 9, 16) +: col(urlCol) +: tieCols.map(col): _*)
    withHost
      .withColumn("worker", worker)
      .withColumn("seq_in_host", row_number().over(w).cast("long") - 1L)
      .withColumn("fetch_offset_ms", col("seq_in_host") * perHostDelayMs)
  }

  /** [[schedule]] with PER-HOST delays — what robots.txt `Crawl-delay`
    * directives ([[RobotsTxt.directivesFrame]]) demand: each host's slot
    * width is its own declared delay, `defaultDelayMs` where the host
    * declared none. `delays` is one slim row per host
    * (host, crawl_delay_ms nullable) and broadcasts; everything else is
    * the same single host-keyed exchange.
    */
  def scheduleWithDelays(urls: DataFrame, urlCol: String, numWorkers: Int,
                         delays: DataFrame, defaultDelayMs: Long,
                         tieCols: Seq[String] = Nil): DataFrame = {
    require(defaultDelayMs >= 0, s"defaultDelayMs must be non-negative, got $defaultDelayMs")
    schedule(urls, urlCol, numWorkers, perHostDelayMs = 1L, tieCols)
      .drop("fetch_offset_ms")
      .join(broadcast(delays.select(col("host"),
        col("crawl_delay_ms").cast("long").as("graft_delay"))), Seq("host"), "left")
      .withColumn("fetch_offset_ms",
        col("seq_in_host") * coalesce(col("graft_delay"), lit(defaultDelayMs)))
      .drop("graft_delay")
  }
}
