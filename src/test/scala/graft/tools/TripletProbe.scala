package graft.tools

import graft.ops.{KMeans, KnnOps, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the hardest-negative quality of the IVF triplet miner vs the
  * exact miner on a scale dir: id agreement AND similarity tightness
  * (exact_neg_sim − mined_neg_sim) percentiles — the evidence for the
  * board query's claim bound. Run:
  * sbt "Test/runMain graft.tools.TripletProbe <sfDir> <nprobe>". */
object TripletProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val np = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val uemb = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.unit(col("embedding"))
          .as("embedding"), col("label"))
      .localCheckpoint(true)
    val n = uemb.count()
    // the PRODUCTION layout rule, not a copy (see RecallProbe)
    val ncells = graft.queries.VectorQueries.sqrtCells(n)
    val cents = KMeans.fit(uemb, "vec_id", "embedding", ncells, 2)
    val anchors = uemb.where(col("vec_id") % 7 === 0 && col("vec_id") < 2000)
    val exact = KnnOps.tripletMine(anchors, uemb, "vec_id", "embedding",
        "label", margin = 0.1)
      .select(col("vec_id"), col("neg_id").as("ne"), col("neg_sim").as("nse"))
    val ivf = KnnOps.tripletMineIvf(anchors, uemb, "vec_id", "embedding",
        "label", cents, nprobe = np, margin = 0.1, posCap = 512)
      .select(col("vec_id"), col("neg_id").as("ni"), col("neg_sim").as("nsi"))
    val j = exact.join(ivf, "vec_id")
      .select(col("vec_id"), (col("ne") === col("ni")).as("agree"),
        (col("nse") - col("nsi")).as("gap"))
      .localCheckpoint(true)
    val total = j.count()
    val agree = j.where(col("agree")).count()
    println(s"TRIPLET n=$n ncells=$ncells nprobe=$np anchors=$total " +
      s"id_agree=${agree.toDouble / total}")
    Seq(0.001, 0.005, 0.01, 0.02, 0.05).foreach { g =>
      val tight = j.where(col("gap") <= g).count()
      println(f"TRIPLET gap<=$g%.3f frac=${tight.toDouble / total}%.3f")
    }
    spark.stop()
  }
}
