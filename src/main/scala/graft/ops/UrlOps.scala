package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL hygiene for web-corpus curation — the operators every crawl-derived
  * training set runs before anything touches document text: canonicalize
  * the URL (so syntactic variants of one page collapse), extract the
  * registered domain (the quota/blocklist/reputation key), dedup exactly
  * by canonical URL, and cap documents per registered domain (the
  * FineWeb-style guard against a single boilerplate-heavy site dominating
  * the corpus).
  *
  * Scale shape: [[canonicalize]] / [[host]] / [[registeredDomain]] are
  * pure scan-stage string expressions — zero shuffle, whole-stage
  * codegen'd, replayable bit-for-bit by the DuckDB oracle (regex steps are
  * RE2-safe). [[dedupByUrl]] is ONE map-side-combined aggregate on the
  * canonical key. [[domainCap]] ranks within registered domain — a single
  * hash shuffle on the domain key; at 100 TB the domain key is the natural
  * partition key for crawl data, and heavy-hitter domains are exactly the
  * rows the cap discards, so the skewed tail is bounded by `cap` per key
  * on output.
  *
  * Reference analog: topic names are normalized/parsed once at the edge
  * and every downstream decision keys on the canonical form
  * (pulsar-common/.../naming/TopicName.java — lowercased scheme, default
  * components filled in, lookup/dedup by canonical name).
  */
object UrlOps {

  /** Public suffixes with a mandatory second level (abridged, heuristic):
    * `sample.co.uk`'s registered domain is `sample.co.uk`, not `co.uk`. */
  val twoLevelSuffixes: Seq[String] =
    Seq("co.uk", "ac.uk", "org.uk", "com.au", "co.jp", "com.br")

  /** Query parameters that never change page identity. */
  private val trackingParam = "^(utm_[a-z0-9]+|fbclid|gclid|msclkid|ref)="

  /** The `scheme://authority` prefix of a URL (empty if scheme-less). */
  private def schemeAuth(u: Column): Column =
    regexp_extract(u, "^([^/]*://[^/?#]*)", 1)

  /** Canonical form: lowercase scheme+host, `www.` stripped, default port
    * stripped (`:80` http / `:443` https — others kept), fragment dropped,
    * duplicate path slashes collapsed, trailing slash dropped, tracking
    * query params removed (param order otherwise preserved; `?` dropped
    * when nothing survives). Pure expression — no shuffle, no UDF. */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val sa     = lower(schemeAuth(noFrag))
    val noWww  = regexp_replace(sa, "://www\\.", "://")
    val auth = when(noWww.startsWith("https://"),
        regexp_replace(noWww, ":443$", ""))
      .when(noWww.startsWith("http://"), regexp_replace(noWww, ":80$", ""))
      .otherwise(noWww)
    val rest  = regexp_replace(noFrag, "^[^/]*://[^/?#]*", "")
    val path  = regexp_extract(rest, "^([^?]*)", 1)
    val cPath = regexp_replace(regexp_replace(path, "/{2,}", "/"),
      "^(.+)/$", "$1")
    val qs   = regexp_extract(rest, "\\?(.*)$", 1)
    val kept = array_join(filter(split(qs, "&"),
      p => !(p.rlike(trackingParam)) && p =!= ""), "&")
    concat(auth, cPath,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** Lowercased host: authority minus `www.` prefix and `:port` suffix. */
  def host(url: Column): Column =
    regexp_replace(regexp_replace(lower(
      regexp_extract(url, "^[^/]*://([^/?#]*)", 1)),
      "^www\\.", ""), ":[0-9]+$", "")

  /** Registered domain of a (lowercased) host under the two-level-suffix
    * heuristic: last two labels, or last three when the last two form a
    * mandatory second-level suffix (`blog.sample.co.uk` → `sample.co.uk`). */
  def registeredDomain(hostCol: Column): Column = {
    val parts = split(hostCol, "\\.")
    val n     = size(parts)
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    when(n >= 3 && last2.isInCollection(twoLevelSuffixes),
      concat_ws(".", element_at(parts, -3), last2))
      .when(n >= 2, last2)
      .otherwise(hostCol)
  }

  /** `docs` with `canon_url`, `host`, `registered_domain` appended in
    * place — the compose-with form ([[FilterCascade.withVerdict]] style):
    * downstream dedup/caps read the columns without re-deriving them. */
  def withUrlColumns(docs: DataFrame, urlCol: String): DataFrame =
    docs.withColumn("canon_url", canonicalize(col(urlCol)))
      .withColumn("host", host(col(urlCol)))
      .withColumn("registered_domain", registeredDomain(host(col(urlCol))))

  /** URL-level filtering (the UT1-blocklist/path-pattern slot of
    * FineWeb-style curation): appends `url_block_reason`
    * (null | 'domain' | 'path' — domain wins) and `url_keep`. Scan-stage
    * expressions only: the domain set is a literal IN-list (a real
    * deployment broadcasts it), path rules are RE2-safe regexes
    * evaluated against the canonical URL so syntactic variants of a
    * blocked page cannot slip through. */
  def urlFilter(docs: DataFrame, urlCol: String,
                blockedDomains: Seq[String],
                pathPatterns: Seq[String]): DataFrame = {
    val base = withUrlColumns(docs, urlCol)
    val domBlocked =
      if (blockedDomains.isEmpty) lit(false)
      else col("registered_domain").isInCollection(blockedDomains)
    val pathBlocked = pathPatterns.map(p => col("canon_url").rlike(p))
      .reduceOption(_ || _).getOrElse(lit(false))
    base.withColumn("url_block_reason",
        when(domBlocked, "domain").when(pathBlocked, "path")
          .otherwise(lit(null).cast("string")))
      .withColumn("url_keep", col("url_block_reason").isNull)
  }

  /** Exact dedup by canonical URL: one map-side-combined aggregate.
    * Returns (canon_url, registered_domain, keeper = min id, n_dups).
    * The keeper election is `min` — order-independent, so partial
    * aggregation holds and replays are idempotent. */
  def dedupByUrl(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    withUrlColumns(docs, urlCol)
      .groupBy(col("canon_url"))
      .agg(min(col("registered_domain")).as("registered_domain"),
        min(col(idCol)).as("keeper"),
        count(lit(1)).as("n_dups"))

  /** Per-registered-domain document cap: keep the top `cap` docs per
    * domain ordered by (`orderCol` desc, id asc — deterministic), flag the
    * rest. One hash shuffle on the domain key; output per domain is
    * bounded by `cap`, so downstream stages never see the heavy tail. */
  def domainCap(docs: DataFrame, idCol: String, urlCol: String,
                orderCol: String, cap: Int): DataFrame = {
    val w = Window.partitionBy(col("registered_domain"))
      .orderBy(col(orderCol).desc, col(idCol))
    withUrlColumns(docs, urlCol)
      .withColumn("rk", row_number().over(w))
      .withColumn("kept", col("rk") <= cap)
  }

  /** The cap's audit report: per-domain totals and survivors — what a
    * corpus build logs per crawl snapshot. */
  def domainCapReport(capped: DataFrame): DataFrame =
    capped.groupBy(col("registered_domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))

  /** Domain-level quality gating (the RefinedWeb/FineWeb escalation of
    * per-doc rules): aggregate a per-document integer quality signal to
    * its registered domain, keep domains whose MEAN clears a threshold —
    * integer cross-multiplied (`sum ≥ thr·n`), no division — and return
    * the domain verdict table (registered_domain, n_docs, signal_sum,
    * domain_keep). Per-doc filtering is then a broadcast semi-join of
    * the verdict onto the corpus: a spam domain is dropped WHOLE, even
    * for its few plausible-looking pages — the call a per-doc rule
    * cannot make.
    *
    * Scale shape: the signal is computed in the scan stage; the rollup
    * is ONE map-side-combined aggregate on the domain key; the verdict
    * table is domain-sized (broadcast side of any downstream join). */
  def domainQuality(docs: DataFrame, urlCol: String,
                    signal: Column, thrNum: Long, thrDen: Long): DataFrame =
    withUrlColumns(docs, urlCol)
      .groupBy(col("registered_domain"))
      .agg(count(lit(1)).as("n_docs"), sum(signal).as("signal_sum"))
      .withColumn("domain_keep",
        col("signal_sum") * thrDen >= col("n_docs") * thrNum)

  /** Anchor-text aggregation per canonical TARGET url — the inverted
    * link signal (how the web describes a page) used for target-side
    * quality scoring and retrieval labels. Input is an extracted-link
    * table (doc, raw href, anchor text); output per canonical target:
    * `n_links` (total in-links), `n_docs` (distinct linking documents),
    * `n_anchors` (distinct anchor strings), `top_anchor` (most frequent,
    * ties to the lexically smallest — deterministic, no window).
    *
    * Scale shape: two aggregates and a join, ALL keyed by the canonical
    * target (the (canon,anchor) pre-aggregation collapses the edge table
    * before the per-target election); anchor payloads are short strings
    * and the output is target-sized, orders below the edge count. The
    * election is `min_by` over a (−count, anchor) struct — an ordinary
    * map-side-combinable aggregate, not a window sort. */
  def anchorStats(links: DataFrame, docCol: String, urlCol: String,
                  anchorCol: String): DataFrame = {
    val base = links.select(col(docCol).as("__doc"),
      canonicalize(col(urlCol)).as("canon_url"),
      col(anchorCol).as("__anchor"))
    val perAnchor = base.groupBy(col("canon_url"), col("__anchor"))
      .agg(count(lit(1)).as("cnt"))
    val top = perAnchor.groupBy(col("canon_url"))
      .agg(sum(col("cnt")).as("n_links"),
        count(lit(1)).as("n_anchors"),
        min_by(col("__anchor"),
          struct((-col("cnt")).as("nc"), col("__anchor").as("a")))
          .as("top_anchor"))
    val docs = base.groupBy(col("canon_url"))
      .agg(countDistinct(col("__doc")).as("n_docs"))
    top.join(docs, "canon_url")
      .select(col("canon_url"), col("n_links"), col("n_docs"),
        col("n_anchors"), col("top_anchor"))
  }
}
