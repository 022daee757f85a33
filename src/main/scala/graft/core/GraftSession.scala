package graft.core

import org.apache.spark.sql.SparkSession

/** The library's session front door: a builder pre-tuned for the engine's
  * workload shape. Local defaults mirror what Verify/Bench use; the
  * production flags are the ones a 1000-executor deployment needs —
  * RocksDB-backed streaming state (delayed-delivery/TableView state can
  * exceed heap), AQE with skew-join handling, and the nanos-parquet
  * compatibility flag for this dataset family.
  */
object GraftSession {

  def builder(master: String = "local[*]",
              shufflePartitions: Option[Int] = None,
              rocksdbState: Boolean = false): SparkSession.Builder = {
    var b = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
    shufflePartitions.foreach(p =>
      b = b.config("spark.sql.shuffle.partitions", p.toString))
    if (rocksdbState)
      b = b.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    b
  }
}
