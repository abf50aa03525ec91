package graft.web

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-domain mirror-site detection: find domain PAIRS serving largely
  * the same content under different hosts — full mirrors (archive hosts,
  * ccTLD clones, CDN vanity domains), the structure that makes per-domain
  * quota caps and per-URL dedup both miss: each mirrored page has a
  * distinct url, and each domain individually looks fine, yet the corpus
  * carries every passage twice. Web-corpus curation (ClueWeb, Common
  * Crawl processing) detects mirrors at the HOST level and drops or
  * merges one side before training-data export.
  *
  * Rule: domains (a, b) are a mirror pair when they share at least
  * `tauPct` percent of the SMALLER side's distinct content fingerprints
  * (Broder-style containment on the fingerprint sets, cross-multiplied so
  * the gate is integer-exact: `shared · 100 ≥ tau · min(n_a, n_b)`).
  *
  * Scale shape (10^12 rows): payloads never move — the input is already
  * slim (domain, fp) rows (fingerprints computed map-side upstream). The
  * distinct is one slim exchange; candidate generation is an fp-keyed
  * self-equi-join whose fan-out is bounded by `maxFpDomains`: a
  * fingerprint present on more than that many domains is boilerplate
  * (league tables, license pages) and contributes C(n,2) pair rows with
  * no mirror signal, so it is dropped BEFORE the join — the hot-key bound
  * that keeps the join linear in corpus size. Domain sizes are map-side
  * partial counts; the final gate joins three slim (domain-pair / size)
  * relations, AQE-broadcast at any realistic domain count.
  */
object Mirrors {

  /** @param d      slim rows carrying `domainCol` and `fpCol`
    * @param tauPct  containment threshold in percent of the smaller side
    * @param maxFpDomains fingerprints on more than this many domains are
    *                     treated as boilerplate and excluded from pairing
    * @return (d1, d2, shared, n1, n2) with d1 < d2
    */
  def mirrorPairs(d: DataFrame, domainCol: String, fpCol: String,
                  tauPct: Int, maxFpDomains: Int = 10): DataFrame = {
    require(tauPct >= 1 && tauPct <= 100, s"tauPct must be in [1,100], got $tauPct")
    val df = d.select(col(domainCol).as("domain"), col(fpCol).as("fp")).distinct()
    // shareable, non-boilerplate fingerprints only (2 ≤ domains ≤ cap)
    val shareable = df.groupBy("fp").agg(count(lit(1)).as("n_dom"))
      .filter(col("n_dom") >= 2 && col("n_dom") <= maxFpDomains)
      .select("fp")
    val slim = df.join(shareable, "fp")
    val sizes = df.groupBy("domain").agg(count(lit(1)).as("n_fp"))
    val pairs = slim.as("a")
      .join(slim.as("b"), col("a.fp") === col("b.fp") && col("a.domain") < col("b.domain"))
      .groupBy(col("a.domain").as("d1"), col("b.domain").as("d2"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.select(col("domain").as("d1"), col("n_fp").as("n1")), "d1")
      .join(sizes.select(col("domain").as("d2"), col("n_fp").as("n2")), "d2")
      .filter(col("shared") * lit(100) >= least(col("n1"), col("n2")) * lit(tauPct))
      .select(col("d1"), col("d2"), col("shared"), col("n1"), col("n2"))
  }

  /** Mirror FAMILIES: the transitive closure of [[mirrorPairs]] — a site
    * mirrored on three hosts yields three pairwise rows, but curation
    * wants ONE decision per family ("keep a.com, drop its clones"), and
    * pairwise containment is not transitive, so the family is the
    * connected component. Output one row per domain that belongs to any
    * mirror family: `(domain, family, n_members, is_canonical)` with
    * `family` = lexicographic-min member (the deterministic survivor a
    * downstream blocklist keeps) and `n_members` ≥ 2.
    *
    * Scale shape: pair generation as [[mirrorPairs]]; the component
    * fixpoint is [[graft.dedup.Dedup.connectedComponents]]'s bounded
    * min-label propagation over the PAIR relation — mirror pairs are
    * vanishingly sparse next to the corpus (pairs of whole domains), so
    * each round is a slim equi-join; family sizes are one more slim agg.
    * Documents and fingerprints never enter the loop.
    */
  def mirrorFamilies(d: DataFrame, domainCol: String, fpCol: String,
                     tauPct: Int, maxFpDomains: Int = 10): DataFrame = {
    val pairs = mirrorPairs(d, domainCol, fpCol, tauPct, maxFpDomains)
      .select(col("d1").as("id1"), col("d2").as("id2"))
    val labels = graft.dedup.Dedup.connectedComponents(pairs)
      .select(col("id").as("domain"), col("label").as("family"))
    val sizes = labels.groupBy(col("family")).agg(count(lit(1)).as("n_members"))
    labels.join(sizes, Seq("family"))
      .select(col("domain"), col("family"), col("n_members"),
        (col("domain") === col("family")).as("is_canonical"))
  }
}
