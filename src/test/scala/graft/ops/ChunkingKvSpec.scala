package graft.ops

import graft.SparkSuite
import graft.core.KeyValueSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ChunkingKvSpec extends SparkSuite {
  import spark.implicits._

  test("chunk split → reassemble round-trips payloads of any size") {
    val df = Seq((1L, "a" * 25 + "b" * 25), (2L, "short"), (3L, "x" * 10))
      .toDF("id", "payload")
    val chunks = Chunking.split(df, "id", "payload", chunkBytes = 10)
    assert(chunks.where(col("uuid") === "1").count() == 5)
    val back = Chunking.reassemble(chunks)
      .as[(String, String)].collect().toMap
    assert(back == Map("1" -> ("a" * 25 + "b" * 25), "2" -> "short",
      "3" -> "x" * 10))
  }

  test("reassemble drops incomplete chunk groups") {
    val df = Seq((1L, "0123456789abcdef")).toDF("id", "payload")
    val chunks = Chunking.split(df, "id", "payload", 4)
      .where(col("chunk_id") =!= 2) // lose a chunk
    assert(Chunking.reassemble(chunks).count() == 0)
  }

  test("reassemble dedups redelivered chunks; duplicate+missing stays incomplete") {
    val df = Seq((1L, "0123456789abcdef")).toDF("id", "payload")
    val chunks = Chunking.split(df, "id", "payload", 4)
    // at-least-once redelivery duplicates chunk 1 → message still assembles
    val withDup = chunks.union(chunks.where(col("chunk_id") === 1))
    val back = Chunking.reassemble(withDup).as[(String, String)].collect()
    assert(back.toSeq == Seq(("1", "0123456789abcdef")))
    // duplicate of chunk 0 AND chunk 1 missing: a raw count would say
    // complete (got==expected) and emit chunk0+chunk0 — must stay incomplete
    val corrupt = chunks.where(col("chunk_id") =!= 1)
      .union(chunks.where(col("chunk_id") === 0))
    assert(Chunking.reassemble(corrupt).count() == 0)
  }

  test("KeyValue INLINE pack/unpack round-trips typed key and value") {
    val df = Seq((7L, "alice", 12.5)).toDF("id", "name", "amount")
    val packed = KeyValueSchema.inline(df, Seq("id"), Seq("name", "amount"))
    assert(packed.select("kv.key.id").as[Long].head() == 7L)
    assert(packed.select("kv.value.amount").as[Double].head() == 12.5)
  }

  test("KeyValue SEPARATED encodes key/value JSON and decodes by schema") {
    val df = Seq((7L, "alice")).toDF("id", "name")
    val sep = KeyValueSchema.separated(df, Seq("id"), Seq("name"))
    val dec = KeyValueSchema.decodeSeparated(sep,
      StructType(Seq(StructField("id", LongType))),
      StructType(Seq(StructField("name", StringType))))
    assert(dec.select("key_rec.id").as[Long].head() == 7L)
    assert(dec.select("value_rec.name").as[String].head() == "alice")
  }

  test("WindowedRunner invokes the user fn once per closed window") {
    import graft.api.{GraftWindowFunction, RecordContext, WindowedRunner}
    object JoinFn extends GraftWindowFunction[String, String] {
      def process(w: Seq[String], ctx: RecordContext): Option[String] =
        Some(w.mkString("+"))
    }
    val df = Seq(
      ("k", ts("2024-01-01 00:00:10"), "a"),
      ("k", ts("2024-01-01 00:00:50"), "b"),
      ("k", ts("2024-01-01 00:01:10"), "c")
    ).toDF("key", "t", "v")
    val out = WindowedRunner.runTumbling(df, "t", "key", "v", "1 minute", JoinFn)
      .select("result").as[String].collect().toSet
    assert(out == Set("a+b", "c"))
  }
}
