package graft.ops

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
                   bands: Int = 4, maxBucket: Int = 1024,
                   prefixChars: Int = 1) {

  /** The stored postings, partitioned on (band, bucket-prefix). Only a
    * MISSING index maps to None — absent path, or a path with no partition
    * directories yet (a zero-row append leaves just a _SUCCESS marker). A
    * read FAILURE (permissions, corrupt footer) must propagate, not
    * silently degrade into "empty index" and drop every cross-batch pair
    * while still reporting success. */
  private def postings(): Option[DataFrame] = {
    val d = new java.io.File(path)
    val hasData = d.exists() &&
      Option(d.listFiles()).getOrElse(Array.empty)
        .exists(f => f.isDirectory && f.getName.startsWith("band="))
    if (!hasData) None else Some(spark.read.parquet(path))
  }

  /** The prefix width the index was CREATED with wins over the
    * constructor: probing p3a-style directories with p3-style filters (or
    * vice versa) would silently match nothing and drop every cross-batch
    * pair, splitting the index into mutually-invisible generations. */
  private lazy val effectivePrefixChars: Int = {
    val f = new java.io.File(path, "_prefix")
    if (f.exists()) {
      val raw = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim
      raw.toIntOption.filter(_ > 0).getOrElse(throw new IllegalStateException(
        s"index at $path has a corrupt _prefix file ('$raw')"))
    } else {
      new java.io.File(path).mkdirs()
      val tmp = new java.io.File(path, "._prefix.tmp")
      java.nio.file.Files.write(tmp.toPath,
        prefixChars.toString.getBytes("UTF-8"))
      if (!tmp.renameTo(f) && !f.exists())
        throw new java.io.IOException(s"could not persist _prefix at $path")
      prefixChars
    }
  }

  /** Bucket prefix of `prefixChars` hex chars (letter-prefixed so
    * partition-column type inference can never read an all-digit value as a
    * number and strip its leading zero): with `bands` × 16^prefixChars
    * partition directories, a probe's static (band, bp) filter prunes the
    * postings scan to the slices the batch touches instead of re-reading
    * the whole index. Default 1 (64 dirs) keeps per-batch file counts sane;
    * raise it when the index dwarfs every batch and finer pruning pays for
    * the extra directories. */
  private def bp =
    concat(lit("p"), substring(col("bucket"), 1, effectivePrefixChars))

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
          // two-stage pruning: STATIC partition filters on the touched
          // bands and bucket-prefixes — collected on the driver, bounded
          // by bands + 256 — cut the listing/scan to (a slight cartesian
          // superset of) the touched slices; the broadcast semi-join then
          // narrows to the exact buckets. Two flat isin filters, NOT a
          // per-pair OR chain: a chain over bands × 256 pairs nests the
          // column tree deep enough to overflow the converter's stack.
          val touchedParts = newBB
            .select(col("band"), bp.as("bp")).distinct()
            .collect().map(r => (r.getInt(0), r.getString(1)))
          val bandsTouched = touchedParts.map(_._1).distinct.toSeq
          val prefixesTouched = touchedParts.map(_._2).distinct.toSeq
          old.where(col("band").isin(bandsTouched: _*) &&
              col("bp").isin(prefixesTouched: _*)).drop("bp")
            .join(broadcast(touched), Seq("band", "bucket"), "left_semi")
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
      // repartition ON the partition columns first: otherwise every task
      // writes one file into every directory it has rows for — tasks ×
      // dirs tiny files per batch instead of one file per touched dir
      newBB.drop("__new").withColumn("bp", bp)
        .repartition(col("band"), col("bp"))
        .write.mode("append").partitionBy("band", "bp").parquet(path)
      pairs
    } finally newBB.unpersist()
  }
}
