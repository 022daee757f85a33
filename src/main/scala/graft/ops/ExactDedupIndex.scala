package graft.ops

import java.io.File

import graft.functions.TextFunctions.fingerprint
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED exact-dedup fingerprint index — the incremental face of
  * [[Dedup.exactSummary]], and the most common production dedup shape: a
  * corpus ingested forever keeps ONE document per distinct content
  * fingerprint, with the keeper being the first arrival (earliest batch,
  * then smallest id within the batch — a total order, so replays and
  * re-splits converge on the same keeper set).
  *
  * Reference analog: broker message dedup persists the highest-sequence
  * map across restarts (pulsar-broker/.../persistent/MessageDeduplication
  * .java snapshots) — content-hash dedup is the corpus-pipeline
  * counterpart, keyed on what the document says instead of who sent it.
  *
  * '''Layout''' ([[GenStore]] generations): rows (fp, id, ord) partitioned
  * by `fpp` = letter-prefixed first md5 hex char (16 directories). A batch
  * probe anti-joins the batch's first-per-fingerprint rows against ONLY
  * the partitions its fingerprints hash into, then appends the survivors —
  * O(batch) work against a corpus-sized store.
  *
  * '''Crash contract.''' A replayed [[addAndDedup]] re-probes with the
  * partially-appended state visible, so already-appended rows drop out of
  * the anti-join and the remainder lands exactly once: the STORE converges
  * (at-most-one row per fingerprint) even though a replayed call's return
  * value may be smaller than the original's. Appends are serialized by a
  * single driver (the shared cron-loop contract); [[compact]] rewrites one
  * file per partition under the atomic pointer swap.
  */
final class ExactDedupIndex(spark: SparkSession, path: String,
                            idCol: String, textCol: String) {

  private val gens = new GenStore(path)

  private def fpp = concat(lit("p"), substring(col("fp"), 1, 1))

  /** Probe + append one batch. Returns the batch rows that were NEW
    * (first occurrence of their content across all batches so far) as
    * (id, fp). Duplicate content within the batch keeps the smallest id. */
  def addAndDedup(batch: DataFrame, ord: Long): DataFrame = {
    val gen = gens.liveOrCreate()
    val fps = batch
      .select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp")).agg(min(col(idCol)).as(idCol))
    val novel = gens.readLive(spark,
      f => f.isDirectory && f.getName.startsWith("fpp=")) match {
      case None => fps
      case Some(stored) =>
        // the batch's fingerprint prefixes, collected (bounded: ≤16 hex
        // chars) to drive static partition pruning of the store scan
        val touched = fps.select(substring(col("fp"), 1, 1))
          .distinct().collect().map(r => "p" + r.getString(0))
        fps.join(stored.where(col("fpp").isin(touched.toSeq: _*))
          .select(col("fp")), Seq("fp"), "left_anti")
    }
    novel.withColumn("ord", lit(ord)).withColumn("fpp", fpp)
      .write.mode("append").partitionBy("fpp")
      .parquet(gen.getAbsolutePath)
    novel.select(col(idCol), col("fp"))
  }

  /** The accumulated keeper set: one (content_hash, keeper_id) row per
    * distinct fingerprint ever ingested. */
  def keepers(): DataFrame =
    gens.readLive(spark,
        f => f.isDirectory && f.getName.startsWith("fpp="))
      .getOrElse(throw new IllegalStateException(
        s"empty exact-dedup index at $path"))
      // a crashed append replayed under a racing reader could have landed
      // a fingerprint twice — arbitrate by the same (ord, id) total order
      // the ingest path uses, so the keeper never flips
      .groupBy(col("fp"))
      .agg(min(struct(col("ord"), col(idCol))).as("__first"))
      .select(col("fp").as("content_hash"),
        col(s"__first.$idCol").as("keeper_id"))

  /** Rewrite the live generation to one arbitrated row per fingerprint,
    * one file per partition; keeps the replaced generation for one cycle. */
  def compact(): Unit = gens.currentGen().foreach { cur =>
    val next = gens.newGenDir()
    spark.read.parquet(cur.getAbsolutePath)
      .groupBy(col("fp"))
      .agg(min(struct(col("ord"), col(idCol))).as("__first"))
      .select(col("fp"), col(s"__first.$idCol").as(idCol),
        col("__first.ord").as("ord"), fpp.as("fpp"))
      .repartition(col("fpp"))
      .write.mode("overwrite").partitionBy("fpp")
      .parquet(next.getAbsolutePath)
    gens.swapPointer(next.getName)
    gens.reapExcept(Set(next.getName, cur.getName))
  }

  /** Live generation path (plan audits / external scans). */
  def currentGenerationPath: Option[String] =
    gens.currentGen().map(_.getAbsolutePath)
}
