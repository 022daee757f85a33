package graft.queries

import graft.core.Tables
import graft.ops.{Hits, PageRank, UrlOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Web-corpus curation queries over the `documents` table: URL
  * canonicalization / dedup / per-domain caps and the domain link-graph
  * centrality signal. URLs are planted deterministically from
  * (doc_id, source) — both engines build the IDENTICAL string, so every
  * canonicalization decision replays bit-for-bit in the DuckDB oracle
  * (the [[TextQueries]] HTML-chrome fixture pattern).
  */
object WebQueries {

  /** Host pool: seven hosts over four registered domains, two of them
    * under a mandatory two-level public suffix. */
  private val urlHosts = Seq("example.com", "news.example.com",
    "sample.co.uk", "blog.sample.co.uk", "example.org", "data.example.org",
    "sample.net")

  /** Deterministic messy URL per document. Docs pair up on `p = doc_id
    * div 2`: both members of a pair canonicalize to the SAME URL but
    * differ in every canonicalization-invariant way — scheme/host case,
    * `www.` prefix, explicit default port, duplicate path slashes,
    * trailing slash, tracking params, fragment. Every 11th pair sits on a
    * non-default port that canonicalization must KEEP. */
  private[queries] def urlCorpus(docs: DataFrame): DataFrame = {
    val p    = expr("doc_id div 2")
    val even = col("doc_id") % 2 === 0
    val sch  = when(p % 2 === 0, lit("http")).otherwise(lit("https"))
    val h    = element_at(typedlit(urlHosts), (p % 7).cast("int") + 1)
    val port = when(p % 11 === 0, lit(":8080"))
      .otherwise(when(even && p % 2 === 0, lit(":80"))
        .when(even, lit(":443")).otherwise(lit("")))
    val qs = when(even,
        concat(lit("?utm_source=feed&id="), (p % 5).cast("string")))
      .otherwise(concat(lit("?id="), (p % 5).cast("string"),
        lit("&utm_campaign=x&gclid=Z")))
    val url = concat(
      when(even, upper(sch)).otherwise(sch), lit("://"),
      when(even, concat(lit("WWW."), upper(h))).otherwise(h),
      port, lit("/a//"), col("source"), lit("/item-"), p.cast("string"),
      when(even, lit("")).otherwise(lit("/")),
      qs,
      when(even, lit("")).otherwise(lit("#sec2")))
    docs.withColumn("url", url)
  }

  /** Oracle CTEs planting the same URLs; ends with table `u` =
    * documents + `url`. */
  private val urlCorpusCtes: String =
    """u0 AS (
         SELECT doc_id, source, n_chars, doc_id // 2 AS p,
                doc_id % 2 = 0 AS ev
         FROM documents),
       u1 AS (
         SELECT doc_id, source, n_chars, p, ev,
           CASE WHEN p % 2 = 0 THEN 'http' ELSE 'https' END AS sch,
           ['example.com','news.example.com','sample.co.uk',
            'blog.sample.co.uk','example.org','data.example.org',
            'sample.net'][CAST(p % 7 AS INT) + 1] AS h,
           CASE WHEN p % 11 = 0 THEN ':8080'
                WHEN ev AND p % 2 = 0 THEN ':80'
                WHEN ev THEN ':443'
                ELSE '' END AS port
         FROM u0),
       u AS (
         SELECT doc_id, source, n_chars,
           (CASE WHEN ev THEN upper(sch) ELSE sch END) || '://' ||
           (CASE WHEN ev THEN 'WWW.' || upper(h) ELSE h END) || port ||
           '/a//' || source || '/item-' || p ||
           (CASE WHEN ev THEN '' ELSE '/' END) ||
           (CASE WHEN ev THEN '?utm_source=feed&id=' || (p % 5)
                 ELSE '?id=' || (p % 5) || '&utm_campaign=x&gclid=Z'
            END) ||
           (CASE WHEN ev THEN '' ELSE '#sec2' END) AS url
         FROM u1)"""

  /** Canonicalization replay chain ([[UrlOps.canonicalize]] /
    * [[UrlOps.host]] / [[UrlOps.registeredDomain]]) over any source
    * table with a `url` column; `keep` columns pass through. Ends with
    * `rd` = ($keep, url, canon_url, host, registered_domain). */
  private def canonCtes(srcTable: String, keep: String): String =
    s""",
       c2 AS (
         SELECT $keep, url,
                lower(regexp_extract(regexp_replace(url, '#.*', ''),
                  '^([^/]*://[^/?#]*)', 1)) AS sa0,
                regexp_replace(regexp_replace(url, '#.*', ''),
                  '^[^/]*://[^/?#]*', '') AS rest
         FROM $srcTable),""" + canonTail(keep)

  private def canonTail(keep: String): String =
    s"""
       c3x AS (SELECT *, regexp_replace(sa0, '://www\\.', '://') AS sa1
              FROM c2),
       c4x AS (
         SELECT *,
           CASE WHEN sa1 LIKE 'https://%'
                  THEN regexp_replace(sa1, ':443$$', '')
                WHEN sa1 LIKE 'http://%'
                  THEN regexp_replace(sa1, ':80$$', '')
                ELSE sa1 END AS auth,
           regexp_replace(regexp_replace(
             regexp_extract(rest, '^([^?]*)', 1), '/{2,}', '/', 'g'),
             '^(.+)/$$', '\\1') AS cpath,
           coalesce(regexp_extract(rest, '\\?(.*)$$', 1), '') AS qs
         FROM c3x),
       c5x AS (
         SELECT *, coalesce(
             array_to_string(list_filter(string_split(qs, '&'),
               x -> x <> '' AND NOT regexp_matches(x,
                 '^(utm_[a-z0-9]+|fbclid|gclid|msclkid|ref)=')), '&'),
             '') AS kq
         FROM c4x),
       canon AS (
         SELECT $keep, url,
           auth || cpath ||
             CASE WHEN kq = '' THEN '' ELSE '?' || kq END AS canon_url,
           regexp_replace(regexp_replace(lower(
             regexp_extract(url, '^[^/]*://([^/?#]*)', 1)),
             '^www\\.', ''), ':[0-9]+$$', '') AS host
         FROM c5x),
       pp AS (SELECT *, string_split(host, '.') AS parts FROM canon),
       rd AS (
         SELECT $keep, url, canon_url, host,
           CASE WHEN len(parts) >= 3 AND
                     (parts[-2] || '.' || parts[-1]) IN
                     ('co.uk','ac.uk','org.uk','com.au','co.jp','com.br')
                  THEN parts[-3] || '.' || parts[-2] || '.' || parts[-1]
                WHEN len(parts) >= 2 THEN parts[-2] || '.' || parts[-1]
                ELSE host END AS registered_domain
         FROM pp)"""

  /** The URL-fixture oracle chain: planted messy URLs + the shared
    * canonicalization replay. */
  private val urlCanonCtes: String =
    urlCorpusCtes + canonCtes("u", "doc_id, source, n_chars")

  /** Pages with two planted outlinks each (one clean https href, one
    * messy uppercase-www-tracking-params href) — the link-extraction
    * fixture. */
  private[queries] def linkedHtmlCorpus(docs: DataFrame): DataFrame = {
    val hostsLit = typedlit(urlHosts)
    val h1 = concat(lit("https://"),
      element_at(hostsLit, (col("doc_id") % 7).cast("int") + 1),
      lit("/p/"), (col("doc_id") % 97).cast("string"))
    val h2 = concat(lit("HTTP://WWW."),
      upper(element_at(hostsLit,
        ((col("doc_id") * 5 + 2) % 7).cast("int") + 1)),
      lit("/q/?utm_source=x&id="), (col("doc_id") % 13).cast("string"))
    docs.withColumn("html", concat(
      lit("<p>intro</p><a class=\"x\" href=\""), h1,
      lit("\">ref one</a><p>"), col("text"),
      lit("</p><a href=\""), h2, lit("\"> two </a>")))
  }

  /** Oracle CTEs planting the same pages and extracting the same link
    * tags; ends with `lk` = (doc_id, anchor, url). */
  private val linkCorpusCtes: String =
    """lk0 AS (
         SELECT doc_id,
           '<p>intro</p><a class="x" href="' ||
             'https://' || ['example.com','news.example.com',
               'sample.co.uk','blog.sample.co.uk','example.org',
               'data.example.org','sample.net'][CAST(doc_id % 7 AS INT) + 1]
             || '/p/' || (doc_id % 97) ||
           '">ref one</a><p>' || text || '</p><a href="' ||
             'HTTP://WWW.' || upper(['example.com','news.example.com',
               'sample.co.uk','blog.sample.co.uk','example.org',
               'data.example.org','sample.net']
               [CAST((doc_id * 5 + 2) % 7 AS INT) + 1])
             || '/q/?utm_source=x&id=' || (doc_id % 13) ||
           '"> two </a>' AS html
         FROM documents),
       lk1 AS (
         SELECT doc_id, unnest(regexp_extract_all(html,
           '<a [^>]*href="[^"]*"[^>]*>[^<]*</a>')) AS tag
         FROM lk0),
       lk AS (
         SELECT doc_id,
                trim(regexp_extract(tag, '>([^<]*)</a>', 1)) AS anchor,
                regexp_extract(tag, 'href="([^"]*)"', 1) AS url
         FROM lk1)"""

  /** Pages with planted `<meta>` directives cycling through blocked and
    * benign variants — the robots-compliance fixture: two true opt-outs
    * (robots noindex, googlebot none), one explicit index, one noindex
    * under a NON-robots name (must not block), one nofollow-only (must
    * not block), and bare pages. */
  private[queries] def metaHtmlCorpus(docs: DataFrame): DataFrame = {
    val r = col("doc_id") % 7
    val meta = when(r === 0,
        lit("<meta name=\"robots\" content=\"noindex, follow\">"))
      .when(r === 1, lit("<meta name=\"googlebot\" content=\"none\">"))
      .when(r === 2, lit("<meta name=\"robots\" content=\"index, follow\">"))
      .when(r === 3, lit("<meta name=\"keywords\" content=\"noindex\">"))
      .when(r === 4, lit("<meta name=\"robots\" content=\"nofollow\">"))
      .otherwise(lit(""))
    docs.select(col("doc_id"),
      concat(lit("<head>"), meta, lit("</head><p>"), col("text"),
        lit("</p>")).as("html"))
  }

  /** Deterministic site-level link graph planted from doc_ids: every
    * document emits two host→host edges; sites 50–59 appear only as
    * targets, so the dangling-mass path is exercised. Residue
    * arithmetic — both engines derive the identical edge set. */
  private[queries] def linkEdges(docs: DataFrame): DataFrame =
    docs.select((col("doc_id") % 50).as("src"),
        expr("(doc_id * 7 + 3) % 60").as("dst"))
      .union(docs.select((col("doc_id") % 50).as("src"),
        expr("(doc_id * 13 + 11) % 60").as("dst")))

  /** The DEDUPED edge list as a persisted corpus-fingerprint-keyed
    * APPENDABLE store ([[graft.ops.EdgeIndex]]): crawl batches append
    * their edge deltas (two batches here — the incremental ingest face)
    * and all four graph queries read the compacted union ACROSS
    * processes. At 100 TB edge extraction is a full-corpus scan; crawl
    * deltas are batch-sized, and rank iterations touch only the
    * node/edge-sized store. Build completeness is marked AFTER the last
    * append + compact: a crash mid-build replays the appends (idempotent
    * — duplicate edge rows collapse on read), concurrent builders race
    * benignly toward the same edge set. */
  private def edgeArtifact(s: SparkSession, d: String): DataFrame = {
    val root = new java.io.File(
      new java.io.File(Artifacts.baseDir, "link-edge-index"),
      Artifacts.corpusFingerprint(d))
    val idx = new graft.ops.EdgeIndex(s, root.getAbsolutePath)
    val marker = new java.io.File(root, "_complete")
    // self-heal: a marked store with no readable batches is a stale or
    // incompatible layout (e.g. pre-staged-batch generations) — wipe and
    // rebuild rather than failing every graph query forever
    if (marker.exists() && !idx.hasData) edgeBuildLock.synchronized {
      if (marker.exists() && !idx.hasData) graft.ops.Fs.deleteRecursively(root)
    }
    // double-checked in-process build lock (the Artifacts discipline):
    // concurrent graph queries on a cold store share one build
    if (!marker.exists()) edgeBuildLock.synchronized {
      if (!marker.exists()) {
        val docs = Tables.documents(s, d)
        idx.addEdges(linkEdges(docs.where(col("doc_id") % 2 === 0)), ord = 0)
        idx.addEdges(linkEdges(docs.where(col("doc_id") % 2 === 1)), ord = 1)
        idx.compact()
        java.nio.file.Files.write(marker.toPath, Array.empty[Byte])
      }
    }
    idx.edges()
  }

  private val edgeBuildLock = new Object

  /** The planted link-graph edge CTE (`e(src, dst)`, deduped) shared by
    * every graph oracle — one definition so the four graph queries can
    * never drift onto different edge sets. */
  private val edgesSqlCte: String =
    """e AS (
        SELECT DISTINCT src, dst FROM (
          SELECT doc_id % 50 AS src, (doc_id*7+3) % 60 AS dst
          FROM documents
          UNION ALL
          SELECT doc_id % 50 AS src, (doc_id*13+11) % 60 AS dst
          FROM documents))"""

  /** The same edge CTE with MATERIALIZED evaluation: DuckDB inlines a
    * plain CTE once PER REFERENCE, and the two-phase warm-start oracles
    * reference the edge/node tables in every unrolled round — enough
    * re-opened parquet handles to trip the fd limit. Materializing
    * evaluates each base table once. */
  private val edgesSqlCteMat: String =
    edgesSqlCte.replaceFirst("e AS \\(", "e AS MATERIALIZED (")

  /** One unrolled PageRank round as chained CTEs — contribution
    * `rank // outdeg`, damping `(85·x) // 100`, dangling `dang // n` —
    * parameterized on the phase's edge/node/degree CTE names so the cold
    * ([[pagerankSql]]) and two-phase warm-start
    * ([[pagerankIncrementalSql]]) oracles replay the IDENTICAL formula. */
  private def pagerankRoundSql(e: String, od: String, nodes: String,
      meta: String, nVar: String, prev: String, out: String,
      s_ : String): String =
    s""",
      c_$out AS MATERIALIZED (
          SELECT $e.dst AS node, sum(r.rank // $od.outdeg) AS in_sum
              FROM $e JOIN $prev r ON $e.src = r.node
              JOIN $od ON $e.src = $od.src
              GROUP BY $e.dst),
      d_$out AS (SELECT coalesce(sum(r.rank), 0) AS dang
              FROM $prev r LEFT JOIN $od ON r.node = $od.src
              WHERE $od.src IS NULL),
      $out AS MATERIALIZED (SELECT $nodes.node,
                CAST((15 * ${s_}) // (100 * $nVar)
                  + (85 * (coalesce(c_$out.in_sum, 0) + dang // $nVar)) // 100
                  AS BIGINT) AS rank
              FROM $nodes CROSS JOIN $meta CROSS JOIN d_$out
              LEFT JOIN c_$out ON $nodes.node = c_$out.node)"""

  /** Unrolled integer-exact PageRank oracle: `iters` chained CTE rounds
    * replaying [[PageRank.ranks]]'s fixed-point formula over the same
    * planted edge set. */
  private def pagerankSql(iters: Int, k: Int): String = {
    val S = "1000000000000"
    val sb = new StringBuilder
    sb.append(s"""WITH $edgesSqlCte,
      nodes AS (SELECT DISTINCT node FROM (
          SELECT src AS node FROM e UNION SELECT dst AS node FROM e)),
      meta AS (SELECT count(*) AS n FROM nodes),
      od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
      r0 AS (SELECT node, $S // n AS rank FROM nodes CROSS JOIN meta)""")
    for (i <- 1 to iters)
      sb.append(pagerankRoundSql("e", "od", "nodes", "meta", "n",
        s"r${i - 1}", s"r$i", S))
    sb.append(s"""
      SELECT node, rank FROM r$iters ORDER BY rank DESC, node LIMIT $k""")
    sb.toString
  }

  /** Unrolled two-phase warm-start oracle replaying
    * `q_pagerank_incremental`: `iters1` rounds over the FIRST crawl
    * batch's edges (doc_id % 10 < 9 — the "previous snapshot", the delta the ~10% tail), then the
    * snapshot's rank vector — delta nodes at uniform mass, renormalized
    * to total `S` when the delta pushed it above — seeds `iters2`
    * rounds over the full appended graph. Integer-exact end to end
    * (S=1e9 keeps `rank·S` inside BIGINT through the renormalizing
    * multiply), so the bit-for-bit hash gate covers both phases AND the
    * hand-off. */
  private def pagerankIncrementalSql(iters1: Int, iters2: Int,
                                     k: Int): String = {
    // explicit BIGINT: a bare 1e9 literal parses as INT32 in DuckDB and
    // 15*S / rank*S then overflow int32/int64 mid-expression
    val S = "CAST(1000000000 AS BIGINT)"
    val sb = new StringBuilder
    sb.append(s"""WITH $edgesSqlCteMat,
      e0 AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM (
          SELECT doc_id % 50 AS src, (doc_id*7+3) % 60 AS dst
          FROM documents WHERE doc_id % 10 < 9
          UNION ALL
          SELECT doc_id % 50 AS src, (doc_id*13+11) % 60 AS dst
          FROM documents WHERE doc_id % 10 < 9)),
      nodes0 AS MATERIALIZED (SELECT DISTINCT node FROM (
          SELECT src AS node FROM e0 UNION SELECT dst AS node FROM e0)),
      meta0 AS (SELECT count(*) AS n0 FROM nodes0),
      od0 AS (SELECT src, count(*) AS outdeg FROM e0 GROUP BY src),
      p0 AS (SELECT node, $S // n0 AS rank FROM nodes0 CROSS JOIN meta0)""")
    for (i <- 1 to iters1)
      sb.append(pagerankRoundSql("e0", "od0", "nodes0", "meta0", "n0",
        s"p${i - 1}", s"p$i", S))
    sb.append(s""",
      nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
          SELECT src AS node FROM e UNION SELECT dst AS node FROM e)),
      meta AS (SELECT count(*) AS n FROM nodes),
      od AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
      r0raw AS (SELECT nodes.node,
               CAST(coalesce(p$iters1.rank, $S // n) AS BIGINT) AS rank
             FROM nodes CROSS JOIN meta
             LEFT JOIN p$iters1 ON nodes.node = p$iters1.node),
      r0tot AS (SELECT coalesce(sum(rank), 0) AS t FROM r0raw),
      r0 AS (SELECT node,
               CAST(CASE WHEN t > $S THEN (rank * $S) // t
                         ELSE rank END AS BIGINT) AS rank
             FROM r0raw CROSS JOIN r0tot)""")
    for (i <- 1 to iters2)
      sb.append(pagerankRoundSql("e", "od", "nodes", "meta", "n",
        s"r${i - 1}", s"r$i", S))
    sb.append(s"""
      SELECT node, rank FROM r$iters2 ORDER BY rank DESC, node LIMIT $k""")
    sb.toString
  }

  /** Unrolled integer-exact HITS oracle: `iters` chained CTE round pairs
    * replaying [[Hits.scores]] — edge-sum then L1 normalization
    * `(raw · S) // tot` per side — over the same planted edge set. */
  /** One unrolled HITS round pair (edge-sum + L1 normalization per
    * side), parameterized on the phase's edge/node CTE names — shared by
    * the cold ([[hitsSql]]) and two-phase warm ([[hitsIncrementalSql]])
    * oracles. `hPrev` -> auth `a_$tag` -> hub `h_$tag`. */
  private def hitsRoundSql(e: String, nodes: String, hPrev: String,
                           tag: String, s_ : String): String =
    s""",
      ar_$tag AS MATERIALIZED (SELECT $e.dst AS node, sum(h.hub) AS raw
               FROM $e JOIN $hPrev h ON $e.src = h.node GROUP BY $e.dst),
      at_$tag AS (SELECT sum(raw) AS tot FROM ar_$tag),
      a_$tag AS MATERIALIZED (SELECT $nodes.node,
                CAST(coalesce((ar_$tag.raw * ${s_}) // at_$tag.tot, 0)
                  AS BIGINT) AS auth
              FROM $nodes CROSS JOIN at_$tag
              LEFT JOIN ar_$tag ON $nodes.node = ar_$tag.node),
      hr_$tag AS MATERIALIZED (SELECT $e.src AS node, sum(a.auth) AS raw
               FROM $e JOIN a_$tag a ON $e.dst = a.node GROUP BY $e.src),
      ht_$tag AS (SELECT sum(raw) AS tot FROM hr_$tag),
      h_$tag AS MATERIALIZED (SELECT $nodes.node,
                CAST(coalesce((hr_$tag.raw * ${s_}) // ht_$tag.tot, 0)
                  AS BIGINT) AS hub
              FROM $nodes CROSS JOIN ht_$tag
              LEFT JOIN hr_$tag ON $nodes.node = hr_$tag.node)"""

  private def hitsSql(iters: Int, k: Int): String = {
    val S = "1000000"
    val sb = new StringBuilder
    sb.append(s"""WITH $edgesSqlCte,
      nodes AS (SELECT DISTINCT node FROM (
          SELECT src AS node FROM e UNION SELECT dst AS node FROM e)),
      h_r0 AS (SELECT node, CAST($S AS BIGINT) AS hub FROM nodes)""")
    for (i <- 1 to iters)
      sb.append(hitsRoundSql("e", "nodes", s"h_r${i - 1}", s"r$i", S))
    sb.append(s"""
      SELECT h_r$iters.node, hub, auth FROM h_r$iters
      JOIN a_r$iters ON h_r$iters.node = a_r$iters.node
      ORDER BY auth DESC, h_r$iters.node LIMIT $k""")
    sb.toString
  }

  /** Unrolled two-phase warm-start HITS oracle replaying
    * `q_hits_incremental`: `iters1` round pairs over the pre-delta
    * edges (doc_id % 10 < 9) from uniform full-scale hubs, then the
    * snapshot's hub vector — delta nodes at the uniform SHARE `S // n`
    * (no renormalization: every half-round L1-normalizes) — seeds
    * `iters2` round pairs over the full graph. */
  private def hitsIncrementalSql(iters1: Int, iters2: Int,
                                 k: Int): String = {
    val S = "1000000"
    val sb = new StringBuilder
    sb.append(s"""WITH $edgesSqlCteMat,
      e0 AS MATERIALIZED (
        SELECT DISTINCT src, dst FROM (
          SELECT doc_id % 50 AS src, (doc_id*7+3) % 60 AS dst
          FROM documents WHERE doc_id % 10 < 9
          UNION ALL
          SELECT doc_id % 50 AS src, (doc_id*13+11) % 60 AS dst
          FROM documents WHERE doc_id % 10 < 9)),
      nodes0 AS MATERIALIZED (SELECT DISTINCT node FROM (
          SELECT src AS node FROM e0 UNION SELECT dst AS node FROM e0)),
      h_p0 AS (SELECT node, CAST($S AS BIGINT) AS hub FROM nodes0)""")
    for (i <- 1 to iters1)
      sb.append(hitsRoundSql("e0", "nodes0", s"h_p${i - 1}", s"p$i", S))
    sb.append(s""",
      nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
          SELECT src AS node FROM e UNION SELECT dst AS node FROM e)),
      meta AS (SELECT count(*) AS n FROM nodes),
      h_w0 AS (SELECT nodes.node,
                 CAST(coalesce(h_p$iters1.hub, $S // n) AS BIGINT) AS hub
               FROM nodes CROSS JOIN meta
               LEFT JOIN h_p$iters1 ON nodes.node = h_p$iters1.node)""")
    for (i <- 1 to iters2)
      sb.append(hitsRoundSql("e", "nodes", s"h_w${i - 1}", s"w$i", S))
    sb.append(s"""
      SELECT h_w$iters2.node, hub, auth FROM h_w$iters2
      JOIN a_w$iters2 ON h_w$iters2.node = a_w$iters2.node
      ORDER BY auth DESC, h_w$iters2.node LIMIT $k""")
    sb.toString
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // URL canonicalization + registered-domain extraction: pure
    // scan-stage expressions (plan-audited zero Exchange) — the messy
    // planted URL, its canonical form, and the domain key every
    // quota/blocklist decision uses downstream.
    "q_url_canonicalize" -> ((s, d) =>
      UrlOps.withUrlColumns(urlCorpus(Tables.documents(s, d)), "url")
        .select(col("doc_id"), col("url"), col("canon_url"), col("host"),
          col("registered_domain"))
        .orderBy(col("doc_id"))),

    // Exact URL dedup: syntactic variants collapse onto one canonical
    // URL; keeper = min doc_id (order-independent ⇒ map-side combine).
    "q_url_dedup" -> ((s, d) =>
      UrlOps.dedupByUrl(urlCorpus(Tables.documents(s, d)), "doc_id", "url")
        .orderBy(col("canon_url"))),

    // FineWeb-style per-registered-domain cap: keep the `cap` largest
    // docs per domain (n_chars desc, doc_id asc), report attrition per
    // domain. One hash shuffle on the domain key.
    "q_domain_cap" -> ((s, d) =>
      UrlOps.domainCapReport(
          UrlOps.domainCap(urlCorpus(Tables.documents(s, d)), "doc_id",
            "url", "n_chars", cap = 40))
        .orderBy(col("registered_domain"))),

    // Site-reputation head: 5 damped power-iteration rounds in integer
    // fixed point over the planted link graph, top-15 by rank — the
    // Common-Crawl-style host ranking a curation run weights by.
    "q_pagerank" -> ((s, d) =>
      PageRank.topRanks(edgeArtifact(s, d), "src", "dst",
        iters = 5, k = 15)),

    // The crawl-delta re-rank: the pre-delta corpus's 5-round ranks
    // (the "previous snapshot": 90% of docs; the delta is the ~10%
    // tail, which plants genuinely NEW source nodes) warm-start 3
    // rounds over the FULL
    // appended graph ([[graft.ops.EdgeIndex]]) — delta nodes join at
    // uniform mass, the seed renormalizes to fixed-point total. The
    // incremental consumption the appendable edge store exists for: at
    // 100 TB the delta re-rank touches only the node/edge-sized store
    // and needs a fraction of the cold rounds (convergence advantage
    // spec'd in PageRankWarmSpec). scale=1e9: the renormalizing
    // multiply must keep rank·scale inside 2^63 in BOTH engines.
    "q_pagerank_incremental" -> ((s, d) => {
      // the previous snapshot's rank vector is itself a persisted
      // corpus artifact (in deployment it EXISTS — it was computed at
      // snapshot time); the delta re-rank reads it and pays only the
      // warm rounds. Deterministic integer ranks, so the found-on-disk
      // path is bit-identical to a fresh phase-1 run.
      val prev = Artifacts.materialized(s, d, "pagerank-snapshot-i5")(
        PageRank.ranks(
          linkEdges(Tables.documents(s, d).where(col("doc_id") % 10 < 9)),
          "src", "dst", iters = 5, scale = 1000000000L).coalesce(1))
      PageRank.ranksWarm(edgeArtifact(s, d), "src", "dst", iters = 3,
          init = prev, scale = 1000000000L)
        .orderBy(col("rank").desc, col("node")).limit(15)
    }),

    // Query-parameter prevalence: every URL's parameter names counted
    // and flagged against the canonicalizer's tracking list — the audit
    // that justifies (and extends) the strip rules: a high-count
    // unflagged parameter is the next candidate. Scan-stage split, one
    // rollup.
    "q_url_params" -> ((s, d) => {
      val qs = regexp_extract(col("url"), "\\?([^#]*)", 1)
      urlCorpus(Tables.documents(s, d))
        .select(explode(filter(split(qs, "&"), p => p =!= "")).as("kv"))
        .select(regexp_extract(col("kv"), "^([^=]*)", 1).as("param"))
        .groupBy(col("param"))
        .agg(count(lit(1)).as("n_urls"))
        .withColumn("is_tracking",
          col("param").rlike("^(utm_[a-z0-9]+|fbclid|gclid|msclkid|ref)$"))
        .orderBy(col("param"))
    }),

    // Reciprocal-link fraction per source node — the link-exchange spam
    // signal (organic linking is mostly one-way; mutual-link rings are
    // manufactured). One self-join on the reversed edge key + one
    // rollup, both node/edge-sized.
    "q_reciprocal_links" -> ((s, d) => {
      val e = edgeArtifact(s, d)
      val rec = e.as("a").join(e.as("b"),
          col("a.src") === col("b.dst") && col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"))
      e.groupBy(col("src")).agg(count(lit(1)).as("n_out"))
        .join(rec.groupBy(col("src")).agg(count(lit(1)).as("n_recip")),
          Seq("src"), "left")
        .select(col("src"), col("n_out"),
          coalesce(col("n_recip"), lit(0L)).as("n_recip"))
        .withColumn("recip_ppm", expr("(1000000 * n_recip) div n_out"))
        .orderBy(col("src"))
    }),

    // Degree-distribution histogram of the link graph: nodes per
    // log2-bucket of out-degree (bucket = binary digit count, an exact
    // integer in both engines via conv/bin string length) — the
    // power-law sanity check a crawl-graph report leads with. Two
    // map-side-combined aggregates, node-sized intermediates.
    "q_degree_dist" -> ((s, d) => {
      val e = edgeArtifact(s, d)
      e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
        .withColumn("bucket",
          length(conv(col("outdeg").cast("string"), 10, 2)).cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_nodes"), sum(col("outdeg")).as("n_edges"))
        .orderBy(col("bucket"))
    }),

    // Hubs vs authorities over the same planted link graph: 4
    // mutual-reinforcement rounds in integer fixed point, top-15 content
    // pages by authority — the directory-vs-content split PageRank alone
    // cannot make.
    // The crawl-delta HITS re-rank (the [[q_pagerank_incremental]]
    // pattern on the mutual-reinforcement side): the pre-delta
    // snapshot's persisted HUB vector seeds 2 round pairs over the full
    // appended graph — delta nodes at the uniform share; no seed
    // renormalization because every half-round L1-normalizes. Top-15
    // authorities, two-phase integer-exact oracle.
    "q_hits_incremental" -> ((s, d) => {
      val prev = Artifacts.materialized(s, d, "hits-snapshot-i4")(
        Hits.scores(
          linkEdges(Tables.documents(s, d).where(col("doc_id") % 10 < 9)),
          "src", "dst", iters = 4)
          .select(col("node"), col("hub")).coalesce(1))
      Hits.scoresWarm(edgeArtifact(s, d), "src", "dst", iters = 2,
          init = prev)
        .orderBy(col("auth").desc, col("node")).limit(15)
    }),

    "q_hits" -> ((s, d) =>
      Hits.topAuthorities(edgeArtifact(s, d), "src", "dst",
        iters = 4, k = 15)),

    // URL-level filtering before anything reads a byte of text: two
    // blocked registered domains (the UT1-blocklist slot) + two path
    // rules evaluated on the CANONICAL url, reason-coded per doc.
    "q_url_filter" -> ((s, d) =>
      UrlOps.urlFilter(urlCorpus(Tables.documents(s, d)), "url",
          blockedDomains = Seq("sample.net", "sample.co.uk"),
          pathPatterns = Seq("id=3$", "/a/src1[0-9]/"))
        .select(col("doc_id"), col("registered_domain"),
          col("url_block_reason"), col("url_keep"))
        .orderBy(col("doc_id"))),

    // Pages → edges: outlink tags extracted from the HTML
    // (Extract.links), hrefs canonicalized and resolved to registered
    // domains (UrlOps) — the crawl-side feed of the PageRank host graph,
    // four operators composed, all scan-stage until the final sort.
    "q_link_extract" -> ((s, d) => {
      val lk = linkedHtmlCorpus(Tables.documents(s, d))
        .select(col("doc_id"),
          explode(graft.ops.Extract.links(col("html"))).as("lk"))
        .select(col("doc_id"), col("lk.href").as("url"),
          col("lk.anchor").as("anchor"))
      lk.withColumn("canon_url", UrlOps.canonicalize(col("url")))
        .withColumn("registered_domain",
          UrlOps.registeredDomain(UrlOps.host(col("url"))))
        .select(col("doc_id"), col("url"), col("canon_url"),
          col("registered_domain"), col("anchor"))
        .orderBy(col("doc_id"), col("canon_url"))
    }),

    // RefinedWeb-style domain-level gating: per-registered-domain doc
    // counts + summed quality signal (n_chars here), keep verdict by
    // integer cross-multiplied mean threshold — the whole-domain call a
    // per-doc rule cannot make. One map-side-combined aggregate.
    "q_domain_quality" -> ((s, d) =>
      UrlOps.domainQuality(urlCorpus(Tables.documents(s, d)), "url",
          col("n_chars").cast("long"), thrNum = 296L, thrDen = 1L)
        .orderBy(col("registered_domain"))),

    // Publisher opt-out compliance: meta-robots noindex/none detection
    // over planted directive variants — the pages a compliant corpus
    // build excludes before quality ever runs. Scan-stage only.
    "q_noindex_filter" -> ((s, d) =>
      metaHtmlCorpus(Tables.documents(s, d))
        .select(col("doc_id"),
          graft.ops.Extract.noindex(col("html")).as("noindex"))
        .withColumn("keep", !col("noindex"))
        .orderBy(col("doc_id"))),

    // End-to-end web curation funnel, one query: URL filter (domain +
    // path rules) → exact canonical-URL dedup (min-id keeper) → domain
    // quality gate (integer mean threshold) → per-domain attrition
    // report (raw → url-kept → unique → final). The audit table every
    // crawl-curation run logs per snapshot; all stages key on
    // canon_url/domain — two aggregates and a broadcast-sized join.
    "q_web_curate" -> ((s, d) => {
      val flt = UrlOps.urlFilter(urlCorpus(Tables.documents(s, d)), "url",
        blockedDomains = Seq("sample.net"), pathPatterns = Seq("id=3$"))
      val kept = flt.where(col("url_keep"))
      val keepers = kept.groupBy(col("canon_url"))
        .agg(min(col("doc_id")).as("doc_id"))
      val uniq = kept.join(keepers, Seq("canon_url", "doc_id"))
      val verdict = uniq.groupBy(col("registered_domain"))
        .agg(count(lit(1)).as("n_unique"),
          sum(col("n_chars").cast("long")).as("chars_sum"))
        .withColumn("domain_keep",
          col("chars_sum") >= col("n_unique") * 296L)
      val rawc = flt.groupBy(col("registered_domain"))
        .agg(count(lit(1)).as("n_raw"),
          sum(when(col("url_keep"), 1L).otherwise(0L)).as("n_url_kept"))
      rawc.join(broadcast(verdict), Seq("registered_domain"), "left")
        .select(col("registered_domain"), col("n_raw"), col("n_url_kept"),
          coalesce(col("n_unique"), lit(0L)).as("n_unique"),
          coalesce(col("domain_keep"), lit(false)).as("domain_keep"),
          when(coalesce(col("domain_keep"), lit(false)), col("n_unique"))
            .otherwise(lit(0L)).as("n_final"))
        .orderBy(col("registered_domain"))
    }),

    // The inverted link signal: anchor text aggregated per canonical
    // TARGET — in-link count, distinct linking docs, and the modal anchor
    // (deterministic min_by election, no window) per target page.
    "q_anchor_text" -> ((s, d) => {
      val lk = linkedHtmlCorpus(Tables.documents(s, d))
        .select(col("doc_id"),
          explode(graft.ops.Extract.links(col("html"))).as("lk"))
        .select(col("doc_id"), col("lk.href").as("url"),
          col("lk.anchor").as("anchor"))
      UrlOps.anchorStats(lk, "doc_id", "url", "anchor")
        .orderBy(col("canon_url"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q_url_canonicalize" ->
      s"""WITH $urlCanonCtes
         SELECT doc_id, url, canon_url, host, registered_domain
         FROM rd ORDER BY doc_id""",

    "q_url_dedup" ->
      s"""WITH $urlCanonCtes
         SELECT canon_url, min(registered_domain) AS registered_domain,
                min(doc_id) AS keeper, count(*) AS n_dups
         FROM rd GROUP BY canon_url ORDER BY canon_url""",

    "q_domain_cap" ->
      s"""WITH $urlCanonCtes,
         rk AS (
           SELECT registered_domain,
                  row_number() OVER (PARTITION BY registered_domain
                    ORDER BY n_chars DESC, doc_id) AS rk
           FROM rd)
         SELECT registered_domain, count(*) AS n_docs,
                CAST(sum(CASE WHEN rk <= 40 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_kept
         FROM rk GROUP BY registered_domain ORDER BY registered_domain""",

    "q_pagerank" -> pagerankSql(iters = 5, k = 15),

    "q_pagerank_incremental" ->
      pagerankIncrementalSql(iters1 = 5, iters2 = 3, k = 15),

    "q_hits" -> hitsSql(iters = 4, k = 15),

    "q_hits_incremental" ->
      hitsIncrementalSql(iters1 = 4, iters2 = 2, k = 15),

    "q_url_params" ->
      s"""WITH $urlCorpusCtes,
         kv AS (
           SELECT unnest(list_filter(string_split(
             coalesce(regexp_extract(url, '\\?([^#]*)', 1), ''), '&'),
             x -> x <> '')) AS kv
           FROM u),
         p AS (SELECT regexp_extract(kv, '^([^=]*)', 1) AS param FROM kv)
         SELECT param, count(*) AS n_urls,
                regexp_matches(param,
                  '^(utm_[a-z0-9]+|fbclid|gclid|msclkid|ref)$$')
                  AS is_tracking
         FROM p GROUP BY param ORDER BY param""",

    "q_reciprocal_links" ->
      s"""WITH $edgesSqlCte,
         rec AS (
           SELECT a.src, count(*) AS n_recip
           FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src
           GROUP BY a.src),
         od AS (SELECT src, count(*) AS n_out FROM e GROUP BY src)
         SELECT od.src, od.n_out,
                CAST(coalesce(rec.n_recip, 0) AS BIGINT) AS n_recip,
                (1000000 * CAST(coalesce(rec.n_recip, 0) AS BIGINT))
                  // od.n_out AS recip_ppm
         FROM od LEFT JOIN rec ON od.src = rec.src
         ORDER BY od.src""",

    "q_degree_dist" ->
      s"""WITH $edgesSqlCte,
         od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src)
         SELECT CAST(length(bin(outdeg)) AS BIGINT) AS bucket,
                count(*) AS n_nodes,
                CAST(sum(outdeg) AS BIGINT) AS n_edges
         FROM od GROUP BY bucket ORDER BY bucket""",

    "q_url_filter" ->
      s"""WITH $urlCanonCtes
         SELECT doc_id, registered_domain,
           CASE WHEN registered_domain IN ('sample.net','sample.co.uk')
                  THEN 'domain'
                WHEN regexp_matches(canon_url, 'id=3$$')
                  OR regexp_matches(canon_url, '/a/src1[0-9]/')
                  THEN 'path'
                ELSE NULL END AS url_block_reason,
           (CASE WHEN registered_domain IN ('sample.net','sample.co.uk')
                  THEN 'domain'
                WHEN regexp_matches(canon_url, 'id=3$$')
                  OR regexp_matches(canon_url, '/a/src1[0-9]/')
                  THEN 'path'
                ELSE NULL END) IS NULL AS url_keep
         FROM rd ORDER BY doc_id""",

    "q_link_extract" ->
      s"""WITH $linkCorpusCtes${canonCtes("lk", "doc_id, anchor")}
         SELECT doc_id, url, canon_url, registered_domain, anchor
         FROM rd ORDER BY doc_id, canon_url""",

    "q_noindex_filter" ->
      """WITH h AS (
           SELECT doc_id,
             '<head>' ||
             (CASE WHEN doc_id % 7 = 0
                     THEN '<meta name="robots" content="noindex, follow">'
                   WHEN doc_id % 7 = 1
                     THEN '<meta name="googlebot" content="none">'
                   WHEN doc_id % 7 = 2
                     THEN '<meta name="robots" content="index, follow">'
                   WHEN doc_id % 7 = 3
                     THEN '<meta name="keywords" content="noindex">'
                   WHEN doc_id % 7 = 4
                     THEN '<meta name="robots" content="nofollow">'
                   ELSE '' END) ||
             '</head><p>' || text || '</p>' AS html
           FROM documents),
         v AS (
           SELECT doc_id,
             len(list_filter(
               regexp_extract_all(html,
                 '<meta [^>]*name="(?:robots|googlebot)"[^>]*>'),
               t -> regexp_matches(
                 regexp_extract(t, 'content="([^"]*)"', 1),
                 '(?:^|[, ])(?:noindex|none)(?:$|[, ])'))) > 0 AS noindex
           FROM h)
         SELECT doc_id, noindex, NOT noindex AS keep
         FROM v ORDER BY doc_id""",

    "q_web_curate" ->
      s"""WITH $urlCanonCtes,
         flt AS (SELECT *,
                   CASE WHEN registered_domain IN ('sample.net')
                          THEN 'domain'
                        WHEN regexp_matches(canon_url, 'id=3$$')
                          THEN 'path'
                        ELSE NULL END AS reason
                 FROM rd),
         kept AS (SELECT * FROM flt WHERE reason IS NULL),
         keepers AS (SELECT canon_url, min(doc_id) AS doc_id
                     FROM kept GROUP BY canon_url),
         uniq AS (SELECT k.* FROM kept k
                  JOIN keepers USING (canon_url, doc_id)),
         verdict AS (SELECT registered_domain, count(*) AS n_unique,
                            CAST(sum(n_chars) AS BIGINT) AS chars_sum
                     FROM uniq GROUP BY registered_domain),
         rawc AS (SELECT registered_domain, count(*) AS n_raw,
                         CAST(sum(CASE WHEN reason IS NULL THEN 1 ELSE 0
                           END) AS BIGINT) AS n_url_kept
                  FROM flt GROUP BY registered_domain)
         SELECT r.registered_domain, r.n_raw, r.n_url_kept,
                coalesce(v.n_unique, 0) AS n_unique,
                coalesce(v.chars_sum >= v.n_unique * 296, false)
                  AS domain_keep,
                CASE WHEN coalesce(v.chars_sum >= v.n_unique * 296, false)
                     THEN v.n_unique ELSE 0 END AS n_final
         FROM rawc r LEFT JOIN verdict v USING (registered_domain)
         ORDER BY r.registered_domain""",

    "q_domain_quality" ->
      s"""WITH $urlCanonCtes
         SELECT registered_domain, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS signal_sum,
                CAST(sum(n_chars) AS BIGINT) >= count(*) * 296
                  AS domain_keep
         FROM rd GROUP BY registered_domain ORDER BY registered_domain""",

    "q_anchor_text" ->
      s"""WITH $linkCorpusCtes${canonCtes("lk", "doc_id, anchor")},
         pa AS (SELECT canon_url, anchor, count(*) AS cnt
                FROM rd GROUP BY canon_url, anchor),
         tp AS (SELECT canon_url, anchor,
                       row_number() OVER (PARTITION BY canon_url
                         ORDER BY cnt DESC, anchor) AS rn
                FROM pa),
         agg AS (SELECT canon_url, CAST(sum(cnt) AS BIGINT) AS n_links,
                        count(*) AS n_anchors
                 FROM pa GROUP BY canon_url),
         dc AS (SELECT canon_url, count(DISTINCT doc_id) AS n_docs
                FROM rd GROUP BY canon_url)
         SELECT agg.canon_url, n_links, n_docs, n_anchors,
                tp.anchor AS top_anchor
         FROM agg
         JOIN tp ON agg.canon_url = tp.canon_url AND tp.rn = 1
         JOIN dc ON agg.canon_url = dc.canon_url
         ORDER BY agg.canon_url"""
  )
}
