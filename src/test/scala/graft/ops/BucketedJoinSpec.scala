package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Co-located join via bucketing: the 100 TB shape for recurring fact-fact
  * joins — both sides pre-bucketed on the join key join with no shuffle. */
class BucketedJoinSpec extends SparkSuite {
  import spark.implicits._

  test("join of two bucketed tables plans without a shuffle exchange") {
    val orders = (1L to 2000L).map(i => (i, s"o$i", (i % 97).toDouble))
      .toDF("okey", "otag", "price")
    val items = (1L to 6000L).map(i => (i % 2000 + 1, i, (i % 13).toDouble))
      .toDF("okey", "item", "qty")
    Sinks.writeBucketed(orders, "b_orders", 8, Seq("okey"))
    Sinks.writeBucketed(items, "b_items", 8, Seq("okey"))

    val joined = spark.table("b_orders")
      .join(spark.table("b_items"), "okey")
      .groupBy("otag").agg(sum("qty").as("q"))
    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    // bucketed-bucketed equi-join: no exchange below the join; the only
    // shuffle allowed is the final small groupBy("otag")
    assert(shuffles.length <= 1,
      s"expected at most the post-join agg shuffle, got ${shuffles.length}")

    // and it computes the right answer
    val expect = orders.join(items, "okey").groupBy("otag")
      .agg(sum("qty").as("q")).as[(String, Double)].collect().toMap
    val got = joined.as[(String, Double)].collect().toMap
    assert(got == expect)
    spark.sql("DROP TABLE b_orders"); spark.sql("DROP TABLE b_items")
  }
}
