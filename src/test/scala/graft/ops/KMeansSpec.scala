package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSuite {
  import spark.implicits._

  // three well-separated clusters in 3d
  private def clustered = (0 until 90).map { i =>
    val c = i % 3
    val bases = Seq(Seq(10f, 0f, 0f), Seq(0f, 10f, 0f), Seq(0f, 0f, 10f))
    val base = bases(c)
    val jitter = (i / 3).toFloat * 0.01f
    (i.toLong, Seq(base(0) + jitter, base(1) - jitter, base(2) + jitter), c)
  }.toDF("vec_id", "embedding", "true_cluster")

  test("fit recovers well-separated clusters") {
    val df = clustered
    val withCell = KMeans.ivfIndex(df, "vec_id", "embedding", k = 3, iters = 5)
    // every true cluster maps to exactly one learned cell and vice versa
    val mapping = withCell.groupBy("true_cluster")
      .agg(countDistinct("cell").as("n"), first("cell").as("cell"))
      .as[(Int, Long, Int)].collect()
    assert(mapping.forall(_._2 == 1L))
    assert(mapping.map(_._3).distinct.length == 3)
  }

  test("trained cells drive ivfTopK") {
    val withCell = KMeans.ivfIndex(clustered, "vec_id", "embedding", 3, 5)
    val res = Similarity.ivfTopK(
      withCell.where(col("vec_id") === 0), withCell,
      "vec_id", "embedding", "cell", k = 3)
    val neigh = res.select("neighbor_id").as[Long].collect()
    // neighbors of vector 0 (cluster 0) are all from cluster 0: ids ≡ 0 mod 3
    assert(neigh.nonEmpty && neigh.forall(_ % 3 == 0))
  }

  test("assignment is deterministic") {
    val cents = KMeans.fit(clustered, "vec_id", "embedding", 3, 3)
    val a = clustered.select(KMeans.assignExpr(col("embedding"), cents))
      .as[Int].collect().toSeq
    val b = clustered.select(KMeans.assignExpr(col("embedding"), cents))
      .as[Int].collect().toSeq
    assert(a == b)
  }

  test("centroids persist, reload bit-identically, and fitOrLoad reuses the artifact") {
    val cents = KMeans.fit(clustered, "vec_id", "embedding", 3, 5)
    val path = java.nio.file.Files.createTempDirectory("ivf-cent")
      .toFile.getAbsolutePath + "/centroids"
    KMeans.saveCentroids(spark, path, cents)
    val back = KMeans.loadCentroids(spark, path)
    assert(back.length == cents.length &&
      back.zip(cents).forall { case (x, y) => x.sameElements(y) },
      "persisted quantizer must round-trip bit-identically")
    // a present artifact is LOADED, not retrained: an empty input would
    // make any training attempt blow up
    val loaded = KMeans.fitOrLoad(clustered.limit(0), "vec_id", "embedding",
      3, 5, path)
    assert(loaded.zip(cents).forall { case (x, y) => x.sameElements(y) })
    // no artifact → trains and persists it
    val path2 = java.nio.file.Files.createTempDirectory("ivf-cent2")
      .toFile.getAbsolutePath + "/centroids"
    val trained = KMeans.fitOrLoad(clustered, "vec_id", "embedding", 3, 5, path2)
    assert(KMeans.loadCentroids(spark, path2)
      .zip(trained).forall { case (x, y) => x.sameElements(y) })
  }
}
