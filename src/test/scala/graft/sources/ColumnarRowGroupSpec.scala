package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSuite
import graft.sources.v2.SegmentCodec
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.spark.sql.functions._

/** The vectorized cold reader rebuilds its column readers at every row-group
  * boundary; offload-produced segments are small enough to land in ONE row
  * group, so this spec writes a cold twin with a tiny row-group size to force
  * many groups (and group sizes that don't divide the 4096-row batch) through
  * the same reader. */
class ColumnarRowGroupSpec extends SparkSuite {
  import spark.implicits._

  test("multi-row-group cold segments decode across group boundaries") {
    val dir = Files.createTempDirectory("colscan-rg").toFile
    val part = new File(dir, "partition-000"); part.mkdirs()
    val seg = new File(part, "segment-b0000000000001-test.jsonl.parquet")

    val conf = new Configuration()
    GroupWriteSupport.setSchema(SegmentCodec.parquetSchema, conf)
    val gf = new SimpleGroupFactory(SegmentCodec.parquetSchema)
    // ~1KB row groups: thousands of groups over 9000 rows, none aligned to
    // the 4096-row vector batch
    val w = ExampleParquetWriter.builder(new Path(seg.getAbsolutePath))
      .withConf(conf).withType(SegmentCodec.parquetSchema)
      .withRowGroupSize(1024L)
      .build()
    val baseMs = ts("2024-01-01 00:00:00").getTime
    try (0 until 9000).foreach { i =>
      val g = gf.newGroup()
      g.append("topic", "t").append("partition", 0)
        .append("offset", i.toLong)
      if (i % 7 != 0) g.append("key", s"k$i")
      g.append("value", s"v$i")
      if (i % 13 != 0) g.append("event_time_ms", baseMs + i)
      g.append("publish_time_ms", baseMs + i)
        .append("producer_name", "p").append("sequence_id", i.toLong)
      w.write(g)
    } finally w.close()

    val df = spark.read.format("graft-topic")
      .option("path", dir.getAbsolutePath).load()
    assert(df.count() == 9000)
    assert(df.agg(sum("offset")).as[Long].head() == (0L until 9000L).sum)
    assert(df.where(col("key").isNull).count() == (0 until 9000).count(_ % 7 == 0))
    assert(df.where(col("event_time").isNull).count() ==
      (0 until 9000).count(_ % 13 == 0))
    val r = df.where(col("offset") === 4097).select("key", "value",
      "publish_time").collect().head
    assert(r.getString(0) == "k4097" && r.getString(1) == "v4097")
    assert(r.getTimestamp(2).getTime == baseMs + 4097)
  }

  test("legacy twins without newer envelope columns null-fill them") {
    import org.apache.parquet.schema.LogicalTypeAnnotation.stringType
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.Types

    val dir = Files.createTempDirectory("colscan-legacy").toFile
    val part = new File(dir, "partition-000"); part.mkdirs()
    val seg = new File(part, "segment-b0000000000001-test.jsonl.parquet")

    // the envelope as it looked before replicated_from existed
    val legacy = Types.buildMessage()
      .optional(BINARY).as(stringType).named("topic")
      .optional(INT32).named("partition")
      .optional(INT64).named("offset")
      .optional(BINARY).as(stringType).named("key")
      .optional(BINARY).as(stringType).named("value")
      .optional(INT64).named("event_time_ms")
      .optional(INT64).named("publish_time_ms")
      .optional(BINARY).as(stringType).named("producer_name")
      .optional(INT64).named("sequence_id")
      .named("graft_segment")
    val conf = new Configuration()
    GroupWriteSupport.setSchema(legacy, conf)
    val gf = new SimpleGroupFactory(legacy)
    val w = ExampleParquetWriter.builder(new Path(seg.getAbsolutePath))
      .withConf(conf).withType(legacy).build()
    val baseMs = ts("2024-01-01 00:00:00").getTime
    try (0 until 100).foreach { i =>
      val g = gf.newGroup()
      g.append("topic", "t").append("partition", 0)
        .append("offset", i.toLong).append("key", s"k$i")
        .append("value", s"v$i").append("event_time_ms", baseMs)
        .append("publish_time_ms", baseMs)
        .append("producer_name", "p").append("sequence_id", i.toLong)
      w.write(g)
    } finally w.close()

    val df = spark.read.format("graft-topic")
      .option("path", dir.getAbsolutePath).load()
    assert(df.count() == 100)
    assert(df.where(col("replicated_from").isNull).count() == 100)
    // a projection of ONLY the missing column still yields 100 null rows
    assert(df.select("replicated_from").collect().forall(_.isNullAt(0)))
    assert(df.agg(sum("offset")).as[Long].head() == (0L until 100L).sum)

    // AS OF over the legacy twin: the row-based reader must also
    // null-fill the missing column instead of failing the projection
    spark.conf.set("spark.sql.catalog.graft_legacy",
      "graft.sources.v2.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_legacy.root",
      dir.getParentFile.getAbsolutePath)
    val tt = spark.sql(s"SELECT replicated_from, offset FROM " +
      s"graft_legacy.`${dir.getName}` TIMESTAMP AS OF '2024-06-01 00:00:00'")
    assert(tt.count() == 100)
    assert(tt.where(col("replicated_from").isNull).count() == 100)
  }
}
