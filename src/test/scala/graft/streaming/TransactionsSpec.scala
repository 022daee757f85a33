package graft.streaming

import java.nio.file.Files

import graft.SparkSuite

class TransactionsSpec extends SparkSuite {
  import spark.implicits._

  private def dirs() = (
    Files.createTempDirectory("txn-s1").toFile.getAbsolutePath,
    Files.createTempDirectory("txn-s2").toFile.getAbsolutePath,
    Files.createTempDirectory("txn-log").toFile.getAbsolutePath)

  test("committed epochs are visible in all sinks, atomically") {
    val (s1, s2, log) = dirs()
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Transactions.writeAll(batch, epochId = 0, Seq(s1, s2), log)
    assert(Transactions.committedRead(spark, s1, log).count() == 2)
    assert(Transactions.committedRead(spark, s2, log).count() == 2)
  }

  test("an epoch without its marker is invisible in every sink") {
    val (s1, s2, log) = dirs()
    Transactions.writeAll(Seq((1L, "a")).toDF("id", "v"), 0, Seq(s1, s2), log)
    // crash simulation: epoch 1 data lands in BOTH sinks but no marker
    val batch = Seq((9L, "uncommitted")).toDF("id", "v")
    Seq(s1, s2).foreach { dir =>
      val staging = new java.io.File(dir, ".txn-stage-e0000000001")
      batch.write.mode("overwrite").json(staging.getAbsolutePath)
      staging.listFiles((_, n) => n.startsWith("part-")).zipWithIndex
        .foreach { case (p, i) =>
          p.renameTo(new java.io.File(dir,
            f"segment-txn-e0000000001-p$i%05d.jsonl"))
        }
    }
    // readers see only epoch 0 in both sinks
    assert(Transactions.committedRead(spark, s1, log)
      .select("id").as[Long].collect().toSet == Set(1L))
    assert(Transactions.committedRead(spark, s2, log)
      .select("id").as[Long].collect().toSet == Set(1L))
    // recovery: the epoch is replayed (idempotent names) and committed
    Transactions.writeAll(batch, 1, Seq(s1, s2), log)
    assert(Transactions.committedRead(spark, s1, log).count() == 2)
    assert(Transactions.committedRead(spark, s2, log)
      .select("id").as[Long].collect().toSet == Set(1L, 9L))
  }

  test("epoch replay is idempotent (no duplicate rows)") {
    val (s1, _, log) = dirs()
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Transactions.writeAll(batch, 0, Seq(s1), log)
    Transactions.writeAll(batch, 0, Seq(s1), log) // checkpoint replay
    assert(Transactions.committedRead(spark, s1, log).count() == 2)
  }
}
