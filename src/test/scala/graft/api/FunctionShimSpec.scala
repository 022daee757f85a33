package graft.api

import graft.SparkSuite

class FunctionShimSpec extends SparkSuite {
  import spark.implicits._

  object ExclamationFn extends GraftFunction[String, String] {
    // reference parity: ExclamationFunction (java-examples)
    def process(in: String, ctx: RecordContext): Option[String] = {
      ctx.incrCounter("processed", 1)
      if (in.isEmpty) None else Some(in + "!")
    }
  }

  object FanOutFn extends GraftFunction[String, String] {
    // reference parity: PublishFunction — context.publish side outputs
    def process(in: String, ctx: RecordContext): Option[String] = {
      if (in.startsWith("err")) ctx.publish("errors", in)
      Some(in)
    }
  }

  test("per-record function maps, filters on None, and counts") {
    val accs = FunctionExecutor.counters(spark, Seq("processed"))
    val raw = FunctionExecutor.run(Seq("a", "", "b").toDS(), ExclamationFn, accs)
    val out = FunctionExecutor.outputs(raw).collect().sorted.toSeq
    assert(out == Seq("a!", "b!"))
    assert(accs("processed").value == 3L) // all records processed, one dropped
  }

  test("publish side outputs are collected per topic") {
    val raw = FunctionExecutor.run(Seq("ok1", "err1", "err2").toDS(), FanOutFn)
    val pubs = FunctionExecutor.publishes(raw).collect()
    assert(pubs.map(_.message).sorted.toSeq == Seq("err1", "err2"))
    assert(pubs.forall(_.topic == "errors"))
    assert(FunctionExecutor.outputs(raw).count() == 3)
  }

  object SumWindowFn extends GraftWindowFunction[Int, Int] {
    // reference parity: AddWindowFunction (java-examples windowed sum)
    def process(w: Seq[Int], ctx: RecordContext): Option[Int] = Some(w.sum)
  }

  test("window function publishes and counters surface as side outputs") {
    import org.apache.spark.sql.functions.{col, lit}
    val df = Seq(
      ("k", ts("2024-01-01 00:00:01"), "a"),
      ("k", ts("2024-01-01 00:00:02"), "b"),
      ("k", ts("2024-01-01 00:10:01"), "c"))
      .toDF("t", "ts", "p").select(col("ts"), lit("k").as("key"), col("p"))
    val fn = new GraftWindowFunction[String, String] {
      def process(items: Seq[String], ctx: RecordContext): Option[String] = {
        ctx.incrCounter("windows", 1)
        if (items.size > 1) ctx.publish("alerts", s"big:${items.size}")
        Some(items.mkString("+"))
      }
    }
    val (results, side) = WindowedRunner.runTumblingWithPublishes(
      df, "ts", "key", "p", "5 minutes", fn)
    assert(results.count() == 2)
    val sides = side.select("topic", "message")
      .as[(String, String)].collect().toSet
    assert(sides.contains(("alerts", "big:2"))) // fan-out captured, not lost
    assert(sides.count(_._1 == "__counter:windows") == 1 ||
      sides.exists(_._1 == "__counter:windows"))
  }

  test("window function processes collected window contents") {
    val ctxStub = new RecordContext {
      def incrCounter(k: String, n: Long): Unit = ()
      def publish(t: String, m: String): Unit = ()
      def currentKey: Option[String] = None
    }
    assert(SumWindowFn.process(Seq(1, 2, 3, 4), ctxStub).contains(10))
  }
}
