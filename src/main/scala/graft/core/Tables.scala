package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided TPC-H-ish testdata (TESTDATA.md).
  *
  * Every graft operator takes DataFrames, so these are conveniences for the
  * query inventory in [[graft.SparkEntry]]. At cluster scale the same parquet
  * layout is what a real deployment reads — the loaders deliberately do not
  * cache or collect anything; Catalyst handles pushdown/pruning.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.parquet has shipped `ts` as parquet TIMESTAMP(NANOS) in some
    * generations (which Spark's vectorized reader rejects —
    * PARQUET_TYPE_ILLEGAL — hence nanosAsLong) and TIMESTAMP(MICROS) in
    * others. Read with nanosAsLong on: nanos arrive as LONG, micros as a
    * timestamp; [[events]] normalizes either to TimestampType. */
  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = eventsRaw(s, d)
    raw.schema("ts").dataType match {
      // nanos generation (read as long): truncate to micros — the same
      // truncation DuckDB's epoch_us does, so oracle hashes agree exactly
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // micros generation: NTZ wall-clock → TimestampType is the identity
      // under the session's fixed UTC zone; keeps every downstream op and
      // the oracle compare on the dtype the board was proven against
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
