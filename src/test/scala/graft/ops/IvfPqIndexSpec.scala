package graft.ops

import java.nio.file.Files

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** [[IvfPqIndex]] — the persisted code store must reproduce the in-memory
  * composed IVF-PQ layout row-for-row through its whole lifecycle
  * (append, second append, compact), while never storing a float vector. */
class IvfPqIndexSpec extends SparkSuite {
  import spark.implicits._

  private def corpus(seed: Long, n: Int, dim: Int = 8) = {
    val rnd = new scala.util.Random(seed)
    (0 until n)
      .map(i => (i.toLong, Seq.fill(dim)((rnd.nextInt(7) - 3).toFloat)))
      .filter(_._2.exists(_ != 0f))
      .toDF("vec_id", "embedding")
  }

  private def inMemory(df: org.apache.spark.sql.DataFrame,
                       cents: Array[Array[Double]], model: Pq.Model,
                       q: org.apache.spark.sql.DataFrame) = {
    val indexed = df
      .withColumn("cell", KMeans.assignExpr(col("embedding"), cents))
      .withColumn("codes", Pq.encodeExpr(col("embedding"), model))
    Pq.ivfPqTopK(q, indexed, "vec_id", "embedding", cents, model,
        k = 3, nprobe = 2, shortlist = 20)
      .orderBy("query_id", "neighbor_id")
      .select($"query_id", $"neighbor_id", round($"sim", 9))
      .collect().toSeq
  }

  test("store search equals the in-memory composed layout across the lifecycle") {
    val df = corpus(3L, 120)
    val cents = KMeans.fit(df, "vec_id", "embedding", 4, 2)
    val model = Pq.train(df, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    val dir = Files.createTempDirectory("ivfpq-idx").toFile.getAbsolutePath
    val idx = new IvfPqIndex(spark, dir, "vec_id", "embedding", model, cents)
    val q = df.where($"vec_id" < 8)
    def fromStore() = idx.search(q, df, nprobe = 2, k = 3, shortlist = 20)
      .orderBy("query_id", "neighbor_id")
      .select($"query_id", $"neighbor_id", round($"sim", 9))
      .collect().toSeq

    idx.add(df.where($"vec_id" % 2 === 0))
    idx.add(df.where($"vec_id" % 2 === 1))
    val expected = inMemory(df, cents, model, q)
    assert(fromStore() == expected, "post-append store diverged")
    idx.compact()
    assert(fromStore() == expected, "compaction changed the answer")
  }

  test("the store never holds a float vector — codes and cell only") {
    val df = corpus(9L, 60)
    val cents = KMeans.fit(df, "vec_id", "embedding", 4, 2)
    val model = Pq.train(df, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    val dir = Files.createTempDirectory("ivfpq-cols").toFile.getAbsolutePath
    val idx = new IvfPqIndex(spark, dir, "vec_id", "embedding", model, cents)
    idx.add(df)
    val gen = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).maxBy(_.getName)
    val schema = spark.read.parquet(gen.getAbsolutePath).schema
    assert(schema.fieldNames.toSet == Set("vec_id", "codes", "cell"),
      s"unexpected stored columns: ${schema.fieldNames.mkString(",")}")
    assert(!schema.map(_.dataType.simpleString).exists(t =>
      t.contains("float") || t.contains("double")),
      s"a vector-typed column leaked into the code store: $schema")
  }

  test("drifted corpus triggers codebook retrain; store matches the NEW model") {
    val df = corpus(21L, 120)
    val cents = KMeans.fit(df, "vec_id", "embedding", 4, 2)
    // a deliberately useless initial model: near-zero codebooks reconstruct
    // every corpus vector as noise, so ADC cannot rank and recall tanks —
    // the "corpus drifted away from its codebooks" state
    val junk = Pq.Model(4, 2, Array.fill(4)(Array(
      Array(0.0, 0.0), Array(0.01, 0.01), Array(-0.01, 0.01),
      Array(0.02, 0.0))))
    val dir = Files.createTempDirectory("ivfpq-drift").toFile.getAbsolutePath
    val idx = new IvfPqIndex(spark, dir, "vec_id", "embedding", junk, cents)
    idx.add(df.where($"vec_id" % 2 === 0))
    idx.add(df.where($"vec_id" % 2 === 1))
    val pol = IvfPqIndex.RecallPolicy(target = 0.9, nprobe = 2, k = 5,
      sampleN = 16, refitIters = 3, shortlist = 8)
    val stats = idx.compact(Some((df, pol))).get
    assert(stats.recall < 0.9, s"junk codebooks should not reach ${stats.recall}")
    assert(stats.retrained, "sagging recall must trigger the retrain")
    val (newModel, newCents) = idx.currentPair
    assert(newModel.codebooks.flatten.flatten.toSeq != junk.codebooks.flatten.flatten.toSeq,
      "retrain must replace the codebooks")
    // bit-identity against the NEW model: the swapped generation's codes
    // were encoded under exactly the pair the store now searches with
    val q = df.where($"vec_id" < 8)
    val got = idx.search(q, df, nprobe = 2, k = 3, shortlist = 20)
      .orderBy("query_id", "neighbor_id")
      .select($"query_id", $"neighbor_id", round($"sim", 9))
      .collect().toSeq
    assert(got == inMemory(df, newCents, newModel, q),
      "post-retrain store diverged from the in-memory layout under the new model")
  }

  test("healthy recall leaves model and answers untouched") {
    val df = corpus(25L, 100)
    val cents = KMeans.fit(df, "vec_id", "embedding", 4, 2)
    val model = Pq.train(df, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    val dir = Files.createTempDirectory("ivfpq-healthy").toFile.getAbsolutePath
    val idx = new IvfPqIndex(spark, dir, "vec_id", "embedding", model, cents)
    idx.add(df)
    val q = df.where($"vec_id" < 5)
    def answers() = idx.search(q, df, nprobe = 2, k = 3, shortlist = 20)
      .orderBy("query_id", "neighbor_id")
      .select($"query_id", $"neighbor_id", round($"sim", 9))
      .collect().toSeq
    val before = answers()
    val stats = idx.compact(Some((df,
      IvfPqIndex.RecallPolicy(target = 0.0)))).get
    assert(!stats.retrained, "target 0 can never trigger a retrain")
    assert(idx.currentPair._1.codebooks.flatten.flatten.toSeq == model.codebooks.flatten.flatten.toSeq,
      "monitored compact without drift must carry the model unchanged")
    assert(answers() == before, "monitored compact changed the answers")
  }

  test("probe budget persists in the generation; compact carries it; " +
    "a codebook retrain drops it") {
    val df = corpus(31L, 120)
    val cents = KMeans.fit(df, "vec_id", "embedding", 4, 2)
    val junk = Pq.Model(4, 2, Array.fill(4)(Array(
      Array(0.0, 0.0), Array(0.01, 0.01), Array(-0.01, 0.01),
      Array(0.02, 0.0))))
    val dir = Files.createTempDirectory("ivfpq-budget").toFile.getAbsolutePath
    val idx = new IvfPqIndex(spark, dir, "vec_id", "embedding", junk, cents)
    idx.add(df)
    assert(idx.probeBudget().isEmpty)
    var tunes = 0
    assert(idx.tunedProbeBudget { tunes += 1; (2, 0.77) } == 2)
    assert(tunes == 1)
    // new handle over the same path — the fresh-JVM shape — reads the
    // stored budget instead of re-running the tuning loop
    val idx2 = new IvfPqIndex(spark, dir, "vec_id", "embedding", junk, cents)
    assert(idx2.tunedProbeBudget { tunes += 1; (99, 0.0) } == 2)
    assert(tunes == 1)
    // an unmonitored compact keeps the quantizer pair — budget carried
    idx.compact()
    assert(idx.probeBudget().contains((2, 0.77)))
    // a retraining compact (junk codebooks, recall tanks) drops it: the
    // budget priced shortlist quality under codebooks that are gone
    val stats = idx.compact(Some((df, IvfPqIndex.RecallPolicy(target = 0.9,
      nprobe = 2, k = 5, sampleN = 16, refitIters = 3, shortlist = 8)))).get
    assert(stats.retrained, s"junk codebooks should trip the monitor: $stats")
    assert(idx.probeBudget().isEmpty,
      "a codebook retrain must invalidate the stored budget")
    assert(idx.tunedProbeBudget { tunes += 1; (4, 0.95) } == 4)
    assert(tunes == 2)
  }

  test("a conflicting re-add (same id, different vector) fails compact loudly") {
    val df = corpus(29L, 40)
    val cents = KMeans.fit(df, "vec_id", "embedding", 4, 2)
    val model = Pq.train(df, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    val dir = Files.createTempDirectory("ivfpq-clash").toFile.getAbsolutePath
    val idx = new IvfPqIndex(spark, dir, "vec_id", "embedding", model, cents)
    idx.add(df)
    // same ids, shuffled vectors: codes/cells disagree with the first add
    idx.add(df.withColumn("embedding",
      org.apache.spark.sql.functions.reverse($"embedding")))
    val e = intercept[IllegalStateException](idx.compact())
    assert(e.getMessage.contains("immutable"), e.getMessage)
  }

  test("replayed append is deduped by compact, answer unchanged") {
    val df = corpus(17L, 80)
    val cents = KMeans.fit(df, "vec_id", "embedding", 4, 2)
    val model = Pq.train(df, "vec_id", "embedding", m = 4, k = 8, iters = 2)
    val dir = Files.createTempDirectory("ivfpq-replay").toFile.getAbsolutePath
    val idx = new IvfPqIndex(spark, dir, "vec_id", "embedding", model, cents)
    val q = df.where($"vec_id" < 5)
    idx.add(df)
    idx.add(df) // crash-replayed batch: identical rows land twice
    idx.compact()
    val got = idx.search(q, df, nprobe = 2, k = 3, shortlist = 20)
      .orderBy("query_id", "neighbor_id")
      .select($"query_id", $"neighbor_id", round($"sim", 9))
      .collect().toSeq
    assert(got == inMemory(df, cents, model, q),
      "replayed rows changed the post-compact answer")
  }
}
