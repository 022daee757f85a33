package graft.ops

import java.nio.file.Files

import graft.SparkSuite
import graft.sources.Topics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SinksTopicsSpec extends SparkSuite {
  import spark.implicits._

  test("mergeSql renders ANSI MERGE with upsert + delete-on-null") {
    val sql = Sinks.mergeSql("tgt", "stg", Seq("id"), Seq("name", "amount"),
      deleteOnNull = Some("name"))
    assert(sql ==
      "MERGE INTO tgt t USING stg s ON t.id = s.id " +
        "WHEN MATCHED AND s.name IS NULL THEN DELETE " +
        "WHEN MATCHED THEN UPDATE SET name = s.name, amount = s.amount " +
        "WHEN NOT MATCHED THEN INSERT (id, name, amount) VALUES (s.id, s.name, s.amount)")
  }

  test("upsertBatch dedupes to last-value-per-key before the merge") {
    val batch = Seq((1L, "a", 10L), (1L, "b", 20L), (2L, "x", 5L))
      .toDF("id", "name", "ord")
    var staged: DataFrame = null
    var sql: String = null
    Sinks.upsertBatch(batch, "ord", "tgt", "stg", Seq("id")) { (df, s) =>
      staged = df; sql = s
    }
    val rows = staged.select("id", "name").as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "b"), (2L, "x"))) // ord=20 wins for id=1
    assert(sql.startsWith("MERGE INTO tgt"))
  }

  private def envelope(topicDir: String, n: Int): Unit =
    (0 until n).map(i => ("t", 0, i.toLong, s"k$i", s"v$i",
      ts("2024-01-01 00:00:01"), ts("2024-01-01 00:00:01"), "p", i.toLong))
      .toDF("topic", "partition", "offset", "key", "value", "event_time",
        "publish_time", "producer_name", "sequence_id")
      .coalesce(1).write.format("graft-topic").option("path", topicDir)
      .mode("append").save()

  test("subscribePattern unions matching topics; readerFrom seeks") {
    val root = Files.createTempDirectory("topics").toFile.getAbsolutePath
    envelope(s"$root/orders-eu", 5)
    envelope(s"$root/orders-us", 7)
    envelope(s"$root/audit", 3)
    val q = Topics.subscribePattern(spark, root, "orders-.*")
      .groupBy().count()
      .writeStream.format("memory").queryName("pat_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    val n = spark.table("pat_out").as[Long].head()
    q.stop()
    assert(n == 12)

    val seek = Topics.readerFrom(spark, s"$root/orders-us",
      startOffset = Some(3L)).count()
    assert(seek == 4)
  }

  test("fileSource attaches file provenance in batch and streaming") {
    val dir = Files.createTempDirectory("fsrc").toFile.getAbsolutePath
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.txt"),
      "l1\nl2\n".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.txt"),
      "l3\n".getBytes)
    val batch = Topics.fileSourceBatch(spark, dir)
      .as[(String, String)].collect()
    assert(batch.length == 3)
    assert(batch.forall { case (_, f) => f.endsWith(".txt") })
    val q = Topics.fileSource(spark, dir)
      .writeStream.format("memory").queryName("fsrc_out")
      .outputMode("append").start()
    q.processAllAvailable()
    val n = spark.table("fsrc_out").count()
    q.stop()
    assert(n == 3)
  }

  test("interceptor chain composes in registration order with drops and metadata") {
    import org.apache.spark.sql.functions._
    val env = Seq(
      ("k1", "hello", Map("a" -> "1")),
      ("k2", "secret", Map.empty[String, String]),
      ("k3", "world", null.asInstanceOf[Map[String, String]]),
      ("k0", null.asInstanceOf[String], Map.empty[String, String]))
      .toDF("key", "value", "properties")
    val intercepted = Interceptors.chain(Seq(
      Interceptors.dropWhere(col("value") === "secret"),
      Interceptors.mapValue(v => upper(v)),
      Interceptors.addProperty("stage", lit("s1")),
      Interceptors.addProperty("stage", lit("s2")) // later one overwrites
    ))(env)
    val rows = intercepted.orderBy("key")
      .select(col("key"), col("value"), col("properties"))
      .as[(String, String, Map[String, String])].collect()
    // k2 dropped; the NULL-value tombstone k0 survives (3-valued-logic trap)
    assert(rows.map(_._1).toSeq == Seq("k0", "k1", "k3"))
    assert(rows.map(_._2).toSeq == Seq(null, "HELLO", "WORLD")) // mapValue ran
    assert(rows.forall(_._3("stage") == "s2")) // chain order: s2 overwrote s1
    assert(rows(1)._3("a") == "1") // k1's pre-existing metadata preserved
  }

  test("replicate fans out to two sinks with independent cursors") {
    val src = Files.createTempDirectory("repl-src").toFile.getAbsolutePath
    val d1 = Files.createTempDirectory("repl-1").toFile.getAbsolutePath
    val d2 = Files.createTempDirectory("repl-2").toFile.getAbsolutePath
    val c1 = Files.createTempDirectory("repl-c1").toFile.getAbsolutePath
    val c2 = Files.createTempDirectory("repl-c2").toFile.getAbsolutePath
    envelope(src, 9)
    val stream = spark.readStream.format("graft-topic").option("path", src).load()
    val qs = Sinks.replicate(stream, "cluster-a", Seq((d1, c1), (d2, c2)))
    qs.foreach(_.processAllAvailable()); qs.foreach(_.stop())
    val r1 = spark.read.format("graft-topic").option("path", d1).load()
    assert(r1.count() == 9)
    assert(spark.read.format("graft-topic").option("path", d2).load().count() == 9)
    // replicated rows carry their origin stamp
    assert(r1.where(col("replicated_from") === "cluster-a").count() == 9)
  }

  test("A↔B replication mesh converges (origin loop guard, no ping-pong)") {
    def tmp(p: String) = Files.createTempDirectory(p).toFile.getAbsolutePath
    val a = tmp("mesh-a"); val b = tmp("mesh-b")
    envelope(a, 5)
    def run(src: String, dst: String, cluster: String, cp: String): Unit = {
      val stream = spark.readStream.format("graft-topic")
        .option("path", src).load()
      val qs = Sinks.replicate(stream, cluster, Seq((dst, cp)))
      qs.foreach(_.processAllAvailable()); qs.foreach(_.stop())
    }
    val cpAB = tmp("mesh-cp-ab"); val cpBA = tmp("mesh-cp-ba")
    def countIn(dir: String) =
      spark.read.format("graft-topic").option("path", dir).load().count()
    // round 1: A's 5 local rows land in B
    run(a, b, "cluster-a", cpAB)
    assert(countIn(b) == 5)
    // round 2: B→A must forward NOTHING (every row in B is remote-origin)
    run(b, a, "cluster-b", cpBA)
    assert(countIn(a) == 5, "replicated rows ping-ponged back to A")
    // round 3: another A→B pass moves nothing new either (same checkpoint)
    run(a, b, "cluster-a", cpAB)
    assert(countIn(b) == 5, "loop guard failed: B keeps accreting copies")
  }
}
