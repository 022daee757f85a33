package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the sf1 validation run (test tooling, not
  * product): stacks `factor` key-shifted copies of a source snapshot so
  * every fact table grows ×factor while dimension tables and all FK
  * relationships stay intact — the same stride-replication a TPC-H dbgen
  * scale-up performs.
  *
  * Document text is word-suffixed per copy (copy 0 verbatim) so
  * cross-copy texts are NOT near-duplicates: naive replication would
  * square the LSH/SimHash pair counts (c copies of a duplicate cluster
  * collide into one (10c)-sized cluster) and any dedup query would read
  * as superlinear for DATA reasons, poisoning the plan-scaling signal
  * the run exists to measure. Embeddings get a small deterministic
  * per-copy perturbation for the same reason. Embeddings replicate at
  * `embFactor` (the testdata series grows them ×4 per decade, not ×10).
  *
  * Usage: sbt "Test/runMain graft.tools.ScaleUp <srcDir> <outDir> 10 4"
  */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorS, embFactorS) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, srcDir, outDir, factorS.toInt, embFactorS.toInt)
    spark.stop()
  }

  def run(spark: SparkSession, srcDir: String, outDir: String,
          factor: Int, embFactor: Int): Unit = {
    require(factor >= 2 && factor <= 100 && embFactor >= 1)

    def read(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    def write(df: DataFrame, t: String, parts: Int): Unit =
      df.repartition(parts)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")

    // key stride per table = max key + 1, so shifted copies never collide
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    val cust = stride(read("customer"), "c_custkey")
    val supp = stride(read("supplier"), "s_suppkey")
    val part = stride(read("part"), "p_partkey")
    val ord = stride(read("orders"), "o_orderkey")
    val ev = stride(read("events"), "event_id")
    val usr = stride(read("events"), "user_id")
    val doc = stride(read("documents"), "doc_id")
    val vec = stride(read("embeddings"), "vec_id")

    /** `factor` stacked copies, each key column shifted by copy×stride. */
    def rep(df: DataFrame, n: Int)(shifts: (String, Long)*): DataFrame = {
      val c = col("__c")
      val shifted = shifts.foldLeft(
        df.withColumn("__c", explode(sequence(lit(0L), lit(n - 1L))))) {
        case (d, (k, s)) => d.withColumn(k, col(k) + c * s)
      }
      shifted.drop("__c")
    }

    // dimensions pass through untouched
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    write(rep(read("customer"), factor)("c_custkey" -> cust), "customer", 4)
    write(rep(read("supplier"), factor)("s_suppkey" -> supp), "supplier", 2)
    write(rep(read("part"), factor)("p_partkey" -> part), "part", 4)
    write(rep(read("orders"), factor)(
      "o_orderkey" -> ord, "o_custkey" -> cust), "orders", 8)
    write(rep(read("lineitem"), factor)(
      "l_orderkey" -> ord, "l_partkey" -> part, "l_suppkey" -> supp),
      "lineitem", 16)
    write(rep(read("events"), factor)(
      "event_id" -> ev, "user_id" -> usr), "events", 8)

    // documents: suffix every word with the copy index (copy 0 verbatim)
    // — distinct shingles/fingerprints per copy, dup structure preserved
    // WITHIN each copy; n_chars recomputed to stay consistent
    val docs = rep(read("documents").withColumn("__c0", lit(0L))
        .drop("__c0"), factor)("doc_id" -> doc)
    val copyOf = expr(s"doc_id div $doc") // recover the copy from the shift
    val perturbed = docs
      .withColumn("text", when(copyOf === 0L, col("text")).otherwise(
        array_join(transform(split(col("text"), " "),
          t => when(t === "", t)
            .otherwise(concat(t, copyOf.cast("string")))), " ")))
      .withColumn("n_chars", length(col("text")).cast("long"))
    write(perturbed, "documents", 8)

    // embeddings: ×embFactor with a deterministic per-copy, per-dim nudge
    val emb = rep(read("embeddings"), embFactor)("vec_id" -> vec)
    val vcopy = expr(s"vec_id div $vec")
    val nudged = emb.withColumn("embedding",
      when(vcopy === 0L, col("embedding")).otherwise(
        // zip_with over a positions array: e_i + ((c*31+i) mod 7 − 3)/100
        zip_with(col("embedding"),
          sequence(lit(0), size(col("embedding")) - 1),
          (e, i) => (e.cast("double") +
            ((vcopy * 31L + i.cast("long")) % 7L - 3L).cast("double")
              / lit(100.0)).cast("float"))))
    write(nudged, "embeddings", 4)

    val counts = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
      .map(t => s"$t=${spark.read.parquet(s"$outDir/$t.parquet").count()}")
    println(s"SCALEUP_DONE ${counts.mkString(" ")}")
  }
}
