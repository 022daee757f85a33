object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val qs = graft.SparkEntry.queries
    for (name <- Seq("q_ann_pq", "q_ann_ivfpq", "q_ann_ivf", "q_embed_topk",
                     "q_semdedup_clusters"); rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = qs(name)(spark, d).collect().length
      println(f"PROBE $name rep$rep rows=$n ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
