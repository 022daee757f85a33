package graft.ops

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The shared generation-directory layout's crash contract: a crash inside
  * swapPointer's non-atomic fallback window must be recoverable (the
  * `_current.prev` breadcrumb), never silently read as an empty store. */
class GenStoreSpec extends AnyFunSuite {

  private def tmp() = Files.createTempDirectory("genstore").toFile

  test("liveOrCreate creates gen-0 and points at it; swap advances") {
    val root = tmp()
    val g = new GenStore(root.getAbsolutePath)
    val gen0 = g.liveOrCreate()
    assert(gen0.getName == "gen-0")
    assert(g.currentGen().map(_.getName).contains("gen-0"))
    val gen1 = g.newGenDir()
    gen1.mkdirs()
    g.swapPointer(gen1.getName)
    assert(g.currentGen().map(_.getName).contains("gen-1"))
  }

  test("missing pointer with a breadcrumb recovers the prior generation " +
    "instead of minting an empty one") {
    val root = tmp()
    val g = new GenStore(root.getAbsolutePath)
    val gen0 = g.liveOrCreate()
    Files.write(new File(gen0, "data.parquet").toPath, "x".getBytes)
    // simulate a crash in the delete-and-retry window: the fallback wrote
    // the breadcrumb, deleted the pointer, then died before the rename
    Files.write(new File(root, "_current.prev").toPath,
      "gen-0".getBytes("UTF-8"))
    assert(g.pointer.delete())
    // recovery: currentGen restores the pointer from the breadcrumb
    assert(g.currentGen().map(_.getName).contains("gen-0"))
    assert(g.pointer.exists())
    // and liveOrCreate now appends into the RECOVERED generation
    assert(g.liveOrCreate().getName == "gen-0")
    assert(new File(g.liveOrCreate(), "data.parquet").exists())
  }

  test("cold start (no pointer, no breadcrumb, no generations) is simply " +
    "missing") {
    val g = new GenStore(tmp().getAbsolutePath + "/nope")
    assert(g.currentGen().isEmpty)
  }
}
