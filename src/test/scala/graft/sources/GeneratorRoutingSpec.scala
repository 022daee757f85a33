package graft.sources

import graft.SparkSuite
import graft.core.Envelope
import graft.ops.{Chunking, Sinks}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class GeneratorRoutingSpec extends SparkSuite {
  import spark.implicits._

  test("person generator produces an unbounded stream with publish_time") {
    val q = Generator.personStream(spark, rowsPerSecond = 500)
      .writeStream.format("memory").queryName("gen_out")
      .outputMode("append").start()
    // let the rate source emit at least one batch
    var spins = 0
    while (spark.table("gen_out").isEmpty && spins < 60) {
      Thread.sleep(250); q.processAllAvailable(); spins += 1
    }
    val rows = spark.table("gen_out").collect()
    q.stop()
    assert(rows.nonEmpty)
    assert(rows.head.schema.fieldNames.contains("publish_time"))
    assert(rows.head.getAs[String]("email").contains("@example.com"))
  }

  test("routing modes partition as configured") {
    val df = (1 to 100).map(i => (s"k${i % 5}", i)).toDF("key", "v")
    assert(Envelope.routeRoundRobin(df, 8).rdd.getNumPartitions == 8)
    assert(Envelope.routeSinglePartition(df).rdd.getNumPartitions == 1)
    val kh = Envelope.routeKeyHash(df, 8)
    assert(kh.rdd.getNumPartitions == 8)
    // key-hash routing is deterministic: same key → same partition
    val parts = kh.select(col("key"), spark_partition_id().as("p"))
      .distinct().groupBy("key").count().as[(String, Long)].collect()
    assert(parts.forall(_._2 == 1L))
    val custom = Envelope.routeCustom(df, 4, col("v") % 4)
    assert(custom.rdd.getNumPartitions == 4)
  }

  test("interceptors apply at the boundary") {
    val df = Seq(("a", 1)).toDF("k", "v")
    val out = Sinks.withProducerInterceptor(df,
      _.withColumn("stamped", lit("x")))
    assert(out.columns.contains("stamped"))
  }

  test("chunking round-trips arbitrary payload/chunk sizes") {
    val gen = for {
      len <- Gen.choose(0, 500)
      chunk <- Gen.choose(1, 64)
    } yield (len, chunk)
    (0 until 12).flatMap(i => gen(Gen.Parameters.default, Seed(11L + i)))
      .foreach { case (len, chunk) =>
        val payload = ("ab" * 250).take(len)
        val df = Seq((1L, payload)).toDF("id", "payload")
        val back = Chunking.reassemble(Chunking.split(df, "id", "payload", chunk))
          .as[(String, String)].collect()
        if (len == 0) {
          // zero-length payload → zero chunks → nothing to reassemble
          assert(back.isEmpty)
        } else {
          assert(back.head._2 == payload, s"len=$len chunk=$chunk")
        }
      }
  }
}
