package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic-data source — the reference's data-generator connector
  * (reference: pulsar-io/data-generator/.../DataGeneratorSource.java:27-39,
  * Person.java:33-90: firstName..address nested record).
  *
  * Spark-first: the `rate` source provides the unbounded tick stream; a
  * deterministic projection (seeded by the tick value, no RNG state) turns
  * ticks into Person records. The same projection works in batch via
  * `spark.range`.
  */
object Generator {

  private val firstNames = Seq("Alice", "Bob", "Carol", "Dave", "Eve", "Frank",
    "Grace", "Heidi", "Ivan", "Judy")
  private val lastNames = Seq("Smith", "Jones", "Lee", "Brown", "Garcia",
    "Miller", "Davis", "Wilson", "Moore", "Taylor")
  private val cities = Seq("Berlin", "Paris", "Madrid", "Rome", "Vienna",
    "Prague", "Lisbon", "Dublin")

  /** Deterministic Person projection from a monotone id column. The nested
    * company/address structs mirror the reference's Person POJO shape. */
  def personCols(idCol: String): Seq[org.apache.spark.sql.Column] = {
    val id = col(idCol)
    def pick(options: Seq[String], salt: Int) =
      element_at(array(options.map(lit): _*),
        (pmod(id * 2654435761L + salt, lit(options.size)) + 1).cast("int"))
    val first = pick(firstNames, 17)
    val last = pick(lastNames, 31)
    Seq(
      id.as("person_id"),
      first.as("firstName"),
      last.as("lastName"),
      lower(concat(first, lit("."), last, lit("@example.com"))).as("email"),
      concat(lower(first), pmod(id, lit(1000)).cast("string")).as("username"),
      (lit(19000101L) + pmod(id * 37L, lit(400000L))).as("dateOfBirth"),
      struct(
        concat(last, lit(" Corp")).as("name"),
        lower(concat(last, lit(".example.com"))).as("domain"),
        lower(concat(lit("info@"), last, lit(".example.com"))).as("email"))
        .as("company"),
      struct(
        concat(pick(cities, 7), lit(" St")).as("street"),
        pmod(id, lit(200)).cast("int").as("streetNumber"),
        pmod(id * 13L, lit(50)).cast("int").as("apartmentNumber"),
        lpad(pmod(id * 101L, lit(99999)).cast("string"), 5, "0").as("postalCode"),
        pick(cities, 3).as("city")).as("address"))
  }

  /** Unbounded streaming generator at `rowsPerSecond`. */
  def personStream(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(personCols("value") :+ col("timestamp").as("publish_time"): _*)

  /** Bounded batch generator of `n` Person rows. */
  def personBatch(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(personCols("id"): _*)
}
