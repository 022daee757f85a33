package graft.streaming

import scala.util.{Failure, Success, Try}

import graft.SparkSuite
import graft.streaming.DeadLetter.Attempt

/** A6 fixture: poison records fail N times then land in the DLQ after
  * maxRedeliverCount (DeadLetterPolicy semantics). */
class DeadLetterSpec extends SparkSuite {
  import spark.implicits._

  private def process(s: String): Try[String] =
    if (s.startsWith("poison")) Failure(new RuntimeException("boom"))
    else Success(s.toUpperCase)

  test("route splits ok/retry/dead by redelivery count") {
    val batch = Seq(
      Attempt("good1", 0), Attempt("poison1", 0), // first failure → retry
      Attempt("poison2", 2) // third failure with max 3 → dead
    )
    val r = DeadLetter.route(batch, maxRedeliverCount = 3)(process)
    assert(r.ok.map(_._2) == Seq("GOOD1"))
    assert(r.retry.map(a => (a.record, a.redeliveryCount)) == Seq(("poison1", 1)))
    assert(r.dead.map(a => (a.record, a.redeliveryCount)) == Seq(("poison2", 3)))
  }

  test("poison message reaches DLQ after exactly maxRedeliverCount attempts") {
    var batch = Seq(Attempt("poison", 0))
    var dead = Seq.empty[Attempt[String]]
    var rounds = 0
    while (batch.nonEmpty && rounds < 10) {
      val r = DeadLetter.route(batch, maxRedeliverCount = 3)(process)
      dead ++= r.dead; batch = r.retry; rounds += 1
    }
    assert(rounds == 3 && dead.head.redeliveryCount == 3)
  }

  test("routeDataset tags records distributed-side") {
    val ds = Seq(Attempt("good", 0), Attempt("poison", 1)).toDS()
    // self-contained lambda: must not capture the (non-serializable) suite
    val fn: String => Try[String] = s =>
      if (s.startsWith("poison")) Failure(new RuntimeException("boom"))
      else Success(s.toUpperCase)
    val out = DeadLetter.routeDataset(ds, 2)(fn).collect().toMap
    assert(out("ok").record == "good")
    assert(out("dead").record == "poison" && out("dead").redeliveryCount == 2)
  }
}
