package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator inventory (SURVEY §2) is split across query modules:
  *   - [[graft.queries.RelationalQueries]]  — scans/filters/joins/aggs/sorts/
  *     set-ops/scalar-fns/analytic-windows (§2.1–§2.8)
  *   - [[graft.queries.StreamingSemanticsQueries]] — windows, compaction,
  *     dedup, delayed delivery, TTL, late data, Key_Shared, envelope (§2.4,
  *     §2.5, §2.9, §1.1)
  *   - [[graft.queries.TextQueries]] — LLM-pipeline text ops (dedup exact/
  *     minhash-LSH/simhash/ngram-jaccard, language ID, quality, fingerprint,
  *     token count, multimodal metadata)
  *   - [[graft.queries.VectorQueries]] — similarity search (brute-force
  *     cosine top-k, IVF/IVF-PQ/SQ8/SRP/LSH/Matryoshka ANN,
  *     classification, mining)
  *   - [[graft.queries.WebQueries]] — web-corpus curation (URL
  *     canonicalization/dedup/filtering, domain caps and quality gates,
  *     link graph: PageRank/HITS/degree/reciprocity, anchor text,
  *     noindex compliance, the composed curation funnel)
  */
object SparkEntry {

  private def tuned(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_join_broadcast")(tuned(spark), "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = RelationalQueries.queries ++
      StreamingSemanticsQueries.queries ++
      TextQueries.queries ++
      VectorQueries.queries ++
      WebQueries.queries
    all.map { case (name, fn) =>
      name -> ((s: SparkSession, d: String) => fn(tuned(s), d))
    }
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Keys absent here (q_ann_lsh, …) get the driver's
    * weaker rows-only check — their bucketing state is engine-side. */
  val oracleSql: Map[String, String] =
    RelationalQueries.oracleSql ++
      StreamingSemanticsQueries.oracleSql ++
      TextQueries.oracleSql ++
      VectorQueries.oracleSql ++
      WebQueries.oracleSql
}
