package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** With a session checkpoint dir configured (the real-cluster deployment
  * shape), the closure's per-round materialization must use RELIABLE
  * checkpoints — localCheckpoint blocks die with a decommissioned executor
  * and would fail the whole job — and still produce the same labels. */
class ComponentsCheckpointSpec extends SparkSuite {
  import spark.implicits._

  test("closure uses reliable checkpoints when a checkpoint dir is set") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cc-ckpt").toFile.getAbsolutePath
    val before = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
      val got = Components.connected(pairs, "doc_a", "doc_b")
        .as[(Long, Long)].collect().toMap
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
      // reliable checkpoint data actually landed under the configured dir
      def files(f: java.io.File): Seq[java.io.File] =
        Option(f.listFiles()).getOrElse(Array.empty)
          .flatMap(c => if (c.isDirectory) files(c) else Seq(c)).toSeq
      assert(files(new java.io.File(dir)).nonEmpty,
        "no reliable checkpoint files written — closure stayed on localCheckpoint")
    } finally {
      // the session is shared JVM-wide across suites and SparkContext has
      // no public unset — restore the previous value (usually None) via
      // the generated setter so later suites keep their localCheckpoint
      // behavior
      spark.sparkContext.getClass.getMethods
        .find(_.getName == "checkpointDir_$eq").get
        .invoke(spark.sparkContext, before)
    }
  }
}
