package graft.ops

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-duplicate detection against a PERSISTED LSH bucket
  * index — the 100 TB shape for a training-data pipeline that ingests
  * continuously: you never re-pair the corpus; each new batch
  *
  *  1. computes its minhash band buckets ([[MinHashLsh.bandBuckets]]),
  *  2. probes the stored postings for ONLY the buckets it touches (a
  *     broadcast semi-join on the batch's distinct bucket keys — untouched
  *     clusters are never expanded),
  *  3. emits candidate pairs that involve at least one NEW document
  *     (old–old pairs were emitted when the older batch arrived, so calls
  *     never re-emit and their outputs are disjoint), and
  *  4. appends its own postings.
  *
  * Feeding a corpus through in any batch split yields exactly the pair set
  * of one-shot [[MinHashLsh.candidatePairs]] over the whole corpus (modulo
  * the star cap in degenerate buckets, which is applied per call) — the
  * `q_dedup_incremental` oracle checks that equality hash-for-hash against
  * the same DuckDB SQL as `q_minhash_lsh`.
  *
  * The reference analog is dedup state that outlives any one run (broker
  * dedup cursors persisted in `MessageDeduplication.java` snapshots); the
  * index here is an append-only parquet postings table, compactable like
  * any other.
  */
class MinHashIndex(spark: SparkSession, path: String, idCol: String,
                   textCol: String, shingleK: Int = 3, numHashes: Int = 16,
                   bands: Int = 4, maxBucket: Int = 1024) {

  private def postings(): Option[DataFrame] =
    Try(spark.read.parquet(path)).toOption

  /** Probe + emit + append for one batch. Returns (doc_a, doc_b) candidate
    * near-dup pairs, doc_a < doc_b, involving at least one batch document. */
  def addAndFindPairs(batch: DataFrame): DataFrame = {
    val rowsPerBand = numHashes / bands
    val newBB = MinHashLsh.bandBuckets(
      MinHashLsh.signatures(batch, idCol, textCol, shingleK, numHashes),
      idCol, bands, rowsPerBand)
      .withColumn("__new", lit(true))
    // the new postings feed three consumers (touched-key set, expansion,
    // append) — materialize the (md5-heavy) signature subtree once
    newBB.persist()
    try {
      val touched = newBB.select("band", "bucket").distinct()
      val oldTouched = postings() match {
        case Some(old) =>
          // ONLY buckets this batch touches leave the scan; with postings
          // laid out bucketed/partitioned this prunes, and the key set is
          // one distinct of the batch — broadcast-able
          old.join(broadcast(touched), Seq("band", "bucket"), "left_semi")
            .withColumn("__new", lit(false))
        case None => newBB.limit(0)
      }
      val tagged = oldTouched.unionByName(newBB)
      // in-group expansion, the candidatePairs shape: sort members by id,
      // pairs (ms[i], ms[j]) i<j keeping only pairs with a new side; the
      // degenerate-bucket star cap fans out around the smallest member.
      // Members are DEDUPED by id first (sorted (id, n) puts a doc's
      // old-posting copy right before its new copy; keep the last of each
      // run, which carries n=true): a crash-replayed batch whose postings
      // already landed re-emits its pairs idempotently instead of pairing
      // every document with itself.
      val grouped = tagged.groupBy(col("band"), col("bucket"))
        .agg(sort_array(collect_list(
          struct(col(idCol).as("id"), col("__new").as("n")))).as("msr"))
        .withColumn("ms", filter(col("msr"), (x, i) =>
          (i === size(col("msr")) - 1) ||
            element_at(col("msr"), i + lit(2))("id") =!= x("id")))
        .drop("msr")
        .where(size(col("ms")) > 1)
      val pairsAll = flatten(transform(col("ms"), (x, i) =>
        filter(
          transform(slice(col("ms"), i + lit(2), size(col("ms"))),
            y => struct(x("id").as("a"), y("id").as("b"),
              (x("n") || y("n")).as("n"))),
          p => p("n"))))
      val hub = element_at(col("ms"), 1)
      val pairsStar = filter(
        transform(slice(col("ms"), lit(2), size(col("ms"))),
          y => struct(hub("id").as("a"), y("id").as("b"),
            (hub("n") || y("n")).as("n"))),
        p => p("n"))
      val pairs = grouped
        .select(explode(when(size(col("ms")) <= maxBucket, pairsAll)
          .otherwise(pairsStar)).as("p"))
        .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
        .distinct()
        // sever lineage BEFORE appending: the append refreshes Spark's view
        // of the postings path, and a lazily recomputed plan would read this
        // batch's own postings back as "old"
        .localCheckpoint(true)
      newBB.drop("__new").write.mode("append").parquet(path)
      pairs
    } finally newBB.unpersist()
  }
}
