package graft.ops

import java.nio.file.Files

import graft.SparkSuite

/** [[GenStore]] retained-generation read-back — the time-travel/rollback
  * face: a replaced generation stays scannable until reaped. */
class GenStoreTimeTravelSpec extends SparkSuite {
  import spark.implicits._

  private def parquetPresent(f: java.io.File) =
    f.getName.endsWith(".parquet")

  test("a replaced generation reads back until reaped; listing is ordered") {
    val root = Files.createTempDirectory("gen-tt").toFile.getAbsolutePath
    val g = new GenStore(root)
    val gen0 = g.liveOrCreate()
    Seq((1L, "old")).toDF("id", "v")
      .write.mode("overwrite").parquet(gen0.getAbsolutePath)
    val gen1 = g.newGenDir(); gen1.mkdirs()
    Seq((1L, "new"), (2L, "added")).toDF("id", "v")
      .write.mode("overwrite").parquet(gen1.getAbsolutePath)
    g.swapPointer(gen1.getName)

    assert(g.generations() == Seq("gen-0", "gen-1"))
    // live read sees the new state; the replaced generation still answers
    val live = g.readLive(spark, parquetPresent).get
      .as[(Long, String)].collect().toSet
    assert(live == Set((1L, "new"), (2L, "added")))
    val old = g.readGeneration(spark, "gen-0", parquetPresent).get
      .as[(Long, String)].collect().toSet
    assert(old == Set((1L, "old")), "pre-compaction state must be readable")

    // after the maintenance reap keeps only the live one, time travel ends
    g.reapExcept(Set("gen-1"))
    assert(g.generations() == Seq("gen-1"))
    assert(g.readGeneration(spark, "gen-0", parquetPresent).isEmpty)
  }
}
