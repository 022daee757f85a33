package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** A4 fixture (FIXTURES.md): interleaved keys, many updates per key,
  * tombstones; expectation = TwoPhaseCompactor semantics. */
class CompactionSpec extends SparkSuite {
  import spark.implicits._

  private def fixture = Seq(
    // (key, value, offset)
    ("k1", "v1", 0L), ("k2", "a1", 1L), ("k1", "v2", 2L), ("k3", "x1", 3L),
    ("k2", "a2", 4L), ("k1", "v3", 5L), ("k3", null, 6L), // tombstone k3
    ("k4", null, 7L), ("k4", "r1", 8L) // tombstone then rewrite k4
  ).toDF("key", "value", "offset")

  test("compact keeps last value per key by offset") {
    val out = Compaction.compact(fixture, Seq("key"), col("offset"))
      .as[(String, String, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("k1", "v3", 5L), ("k2", "a2", 4L),
      ("k3", null, 6L), ("k4", "r1", 8L)))
  }

  test("compactWithTombstones drops keys whose last record is null") {
    val out = Compaction
      .compactWithTombstones(fixture, Seq("key"), col("offset"), "value")
      .as[(String, String, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq("k1", "k2", "k4"))
  }

  test("tableView returns key→latest-value pairs") {
    val tv = Compaction.tableView(fixture, "key", "value", col("offset"))
      .as[(String, String)].collect().toMap
    assert(tv == Map("k1" -> "v3", "k2" -> "a2", "k4" -> "r1"))
  }

  test("strategic ordering: custom max_by column wins over offset") {
    // StrategicTwoPhaseCompactor analog: order by (priority, offset).
    val df = Seq(("k", "low", 1, 10L), ("k", "high", 9, 2L))
      .toDF("key", "value", "prio", "offset")
    val out = Compaction.compact(df, Seq("key"),
      struct(col("prio"), col("offset"))).as[(String, String, Int, Long)]
      .collect()
    assert(out.head._2 == "high")
  }
}
