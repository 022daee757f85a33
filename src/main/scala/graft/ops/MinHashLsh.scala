package graft.ops

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection: shingle → minhash signature → band
  * → bucket-join.
  *
  * Scale design: candidate generation is a self-join on (band, bucket-hash) —
  * a hash shuffle on the bucket key, never an all-pairs product. With b bands
  * of r rows, docs with Jaccard j collide in some band with probability
  * 1 − (1 − j^r)^b; b=4, r=4 puts the S-curve threshold near j ≈ 0.7. Hashes
  * are md5-keyed so a SQL oracle reproduces them exactly.
  */
object MinHashLsh {

  /** MinHash signature per document: one row per doc with `mh0..mh{n-1}`. */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
                 shingleK: Int = 3, numHashes: Int = 16): DataFrame = {
    val sh = shingles(col(textCol), shingleK).as("__sh")
    val base = docs.select(col(idCol), sh).where(size(col("__sh")) > 0)
    base.select(
      col(idCol) +:
        (0 until numHashes).map(s => minhash(col("__sh"), s).as(s"mh$s")): _*)
  }

  /** Band hashes: (doc, band, bucket) rows; bucket = md5 of the band's
    * concatenated minhashes. */
  def bandBuckets(sigs: DataFrame, idCol: String,
                  bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat_ws("|", parts: _*)).as("bucket"))
        .as(s"__b$b")
    }
    sigs.select(col(idCol) +: bandCols: _*)
      .select(col(idCol), explode(array((0 until bands).map(b => col(s"__b$b")): _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Candidate near-duplicate pairs (a < b): docs sharing any band bucket.
    * The self-join shuffles on (band, bucket) — LSH's whole point at scale. */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     shingleK: Int = 3, numHashes: Int = 16,
                     bands: Int = 4): DataFrame = {
    val rows = numHashes / bands
    val bb = bandBuckets(signatures(docs, idCol, textCol, shingleK, numHashes),
      idCol, bands, rows)
    val a = bb.select(col(idCol).as("doc_a"), col("band"), col("bucket"))
    val b = bb.select(col(idCol).as("doc_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Exact n-gram Jaccard similarity for given pairs — the verify step after
    * LSH candidate generation (or, bounded by a blocking key, a standalone
    * exact near-dup pass). */
  def jaccardOfPairs(pairs: DataFrame, docs: DataFrame, idCol: String,
                     textCol: String, shingleK: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol),
      shingles(col(textCol), shingleK).as("__sh"))
    val a = sh.select(col(idCol).as("doc_a"), col("__sh").as("__sha"))
    val b = sh.select(col(idCol).as("doc_b"), col("__sh").as("__shb"))
    pairs.join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter",
        size(array_intersect(col("__sha"), col("__shb"))).cast("double"))
      .withColumn("jaccard",
        round(col("inter") /
          (size(col("__sha")) + size(col("__shb")) - col("inter")), 6))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }
}
