package graft.ops

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** [[SingleFlight]] — the per-key memo under a concurrent query board.
  * The contract the r11 contention fix leans on: same-key cold racers
  * share exactly ONE computation, different keys never wait on each
  * other, and a failed computation poisons its cell for every waiter
  * (trained-artifact determinism: a deterministic build that failed once
  * will fail again — retries belong to the caller). */
class SingleFlightSpec extends AnyFunSuite {

  test("same-key racers share exactly one computation") {
    val sf = new SingleFlight[String, Int]
    val runs = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val threads = (1 to 16).map { _ =>
      new Thread(() => {
        start.await()
        results.add(sf("k") { runs.incrementAndGet(); Thread.sleep(50); 42 })
      })
    }
    threads.foreach(_.start()); start.countDown()
    threads.foreach(_.join(10000))
    assert(runs.get() == 1, s"compute ran ${runs.get()} times")
    import scala.jdk.CollectionConverters._
    assert(results.asScala.toSeq == Seq.fill(16)(42))
  }

  test("different keys compute concurrently, never serialized by the map") {
    val sf = new SingleFlight[Int, Int]
    // both computations must be IN FLIGHT at once: each blocks until the
    // other has started — possible only if neither holds a shared lock
    val aStarted = new CountDownLatch(1)
    val bStarted = new CountDownLatch(1)
    @volatile var overlap = true
    val ta = new Thread(() => sf(1) {
      aStarted.countDown()
      if (!bStarted.await(5, TimeUnit.SECONDS)) overlap = false
      1
    })
    val tb = new Thread(() => sf(2) {
      bStarted.countDown()
      if (!aStarted.await(5, TimeUnit.SECONDS)) overlap = false
      2
    })
    ta.start(); tb.start(); ta.join(10000); tb.join(10000)
    assert(overlap, "different-key computations must overlap")
    assert(sf(1)(fail("must be memoized")) == 1)
    assert(sf(2)(fail("must be memoized")) == 2)
  }

  test("a failed computation poisons the cell for every later caller") {
    val sf = new SingleFlight[String, Int]
    val runs = new AtomicInteger(0)
    val boom = intercept[IllegalStateException] {
      sf("k") { runs.incrementAndGet(); throw new IllegalStateException("x") }
    }
    // same exception instance, no recompute: lazy val failure semantics
    val again = intercept[IllegalStateException] {
      sf("k") { runs.incrementAndGet(); 7 }
    }
    assert(runs.get() == 1, "the failed compute must not be retried")
    assert(boom.getMessage == "x" && again.getMessage == "x")
  }
}
