package graft.ops

import java.io.File
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** [[StoreLock]] — the write-face serializer the single-writer stores
  * hang their safety on. (The cross-PROCESS half is exercised for real
  * in CrossProcessStoreSpec; these are the in-JVM laws.) */
class StoreLockSpec extends AnyFunSuite {

  private def tmp() = Files.createTempDirectory("storelock").toFile

  test("bodies under one root are strictly serialized across threads") {
    val root = tmp()
    val inside = new AtomicInteger(0)
    val maxSeen = new AtomicInteger(0)
    Fs.inParallel(1 to 16, maxThreads = 16) { _ =>
      StoreLock.exclusive(root) {
        val now = inside.incrementAndGet()
        maxSeen.getAndUpdate(m => math.max(m, now))
        Thread.sleep(5)
        inside.decrementAndGet()
        ()
      }
    }
    assert(maxSeen.get() == 1,
      s"${maxSeen.get()} threads were inside the lock at once")
  }

  test("distinct roots do not serialize against each other") {
    // two stores must be lockable concurrently (a pipeline appends to
    // many stores) — pin it by holding root A while locking root B
    val a = tmp(); val b = tmp()
    StoreLock.exclusive(a) {
      val done = new java.util.concurrent.CountDownLatch(1)
      new Thread(() => StoreLock.exclusive(b) { done.countDown() }).start()
      assert(done.await(10, java.util.concurrent.TimeUnit.SECONDS),
        "locking root B deadlocked behind held root A")
    }
  }

  test("the lock releases on a throwing body") {
    val root = tmp()
    intercept[RuntimeException](
      StoreLock.exclusive(root) { throw new RuntimeException("boom") })
    // reacquirable immediately — a leaked FileLock would deadlock here
    val ok = StoreLock.exclusive(root) { 42 }
    assert(ok == 42)
  }

  test("creates the root so the first append can provision the store") {
    val root = new File(tmp(), "deep/nested/store")
    assert(!root.exists())
    StoreLock.exclusive(root) { assert(root.isDirectory) }
    assert(new File(root, "_lock").isFile)
  }
}
