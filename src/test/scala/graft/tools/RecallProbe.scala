package graft.tools

import graft.ops.{KMeans, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the kNN-join recall curve that prices the √n-cell layout's
  * nprobe: for a scale dir, train the [[graft.queries.VectorQueries]]
  * sqrtCells-sized quantizer on the train split and print recall@5 of
  * the probed candidate set vs exact brute force for a sweep of nprobe
  * values, on the bounded original-id anchor slice the board queries
  * audit. Run: sbt "Test/runMain graft.tools.RecallProbe <sfDir> [k...]".
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.unit(col("embedding"))
          .as("embedding"))
    val test = emb.where(col("vec_id") % 10 === 0 && col("vec_id") < 2000)
      .localCheckpoint(true)
    val train = emb.where(col("vec_id") % 10 =!= 0).localCheckpoint(true)
    val n = train.count()
    // the PRODUCTION layout rule, not a copy: a drifted duplicate would
    // make this probe measure a different layout than the board runs
    val ncells = graft.queries.VectorQueries.sqrtCells(n)
    println(s"RECALL_PROBE n_train=$n ncells=$ncells")
    val cents = KMeans.fit(train, "vec_id", "embedding", ncells, 2)
    val probes = (if (args.length > 1) args.drop(1).map(_.toInt).toSeq
                  else Seq(2, 4, 6, 8, 12, 16)).filter(_ <= cents.length)
    val profile = Similarity.ivfProbeProfile(test, train, "vec_id",
      "embedding", cents, probes, 5)
    val exact = Similarity.bruteForceTopK(test, train, "vec_id",
      "embedding", 5)
    val rec = Similarity.probeRecalls(profile, exact, probes)
    rec.orderBy(col("nprobe")).collect().foreach(r => println(
      s"RECALL nprobe=${r.get(0)} recall=${r.get(1)}"))
    spark.stop()
  }
}
