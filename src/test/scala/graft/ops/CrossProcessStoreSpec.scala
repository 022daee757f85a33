package graft.ops

import java.io.File
import java.nio.file.Files

import graft.SparkSuite
import graft.tools.ForkAppend
import scala.jdk.CollectionConverters._

/** Cross-PROCESS store contention: EdgeIndexSpec proves concurrent
  * appenders safe inside one JVM, but committer `_temporary` roots, POSIX
  * renames, and file locks are per-process state — so this spec forks two
  * REAL JVMs (ProcessBuilder → graft.tools.ForkAppend) appending
  * overlapping batches to ONE EdgeIndex (lock-free staged-rename appends)
  * and ONE ExactDedupIndex (StoreLock-serialized probe-then-append)
  * concurrently, with a ready/go barrier so the append phases actually
  * overlap, and asserts both stores land on the serial baseline's state.
  *
  * Finding that motivated StoreLock (recorded in SCALING.md): without it,
  * two processes' append jobs into one directory share the committer's
  * `_temporary` root — each job DELETES that tree on commit, destroying
  * the other's in-flight task files; the probe-then-append stores are
  * also semantically single-writer. The edge store needs no lock: every
  * batch stages in a private dir and publishes by one atomic rename.
  *
  * Reference analog: exclusive-producer access vs shared topic appends
  * (pulsar-client-api/.../ProducerAccessMode.java) and ledger creation
  * preceding entry appends (managed-ledger/.../ManagedLedgerImpl.java).
  */
class CrossProcessStoreSpec extends SparkSuite {

  private val Workers = 2
  private val Batches = 3

  /** Fork one ForkAppend child with the parent's classpath and the same
    * --add-opens set sbt forked this test JVM with. */
  private def fork(root: String, worker: Int): Process = {
    val javaBin = new File(new File(sys.props("java.home"), "bin"), "java")
      .getAbsolutePath
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toList
    val opens = jvmArgs.zipWithIndex.collect {
      case (a, i) if a == "--add-opens" => List(a, jvmArgs(i + 1))
    }.flatten
    val cmd = List(javaBin) ++ opens ++ List(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path"),
      "graft.tools.ForkAppend", root, worker.toString, Batches.toString)
    new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true)
      .redirectOutput(new File(root, s"worker-$worker.log"))
      .start()
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("two JVMs appending concurrently converge to the serial result") {
    // ---- serial baseline: same batches, one writer, global ord order
    val ser = Files.createTempDirectory("xproc-serial").toFile.getAbsolutePath
    val serEdges = new EdgeIndex(spark, s"$ser/edges")
    val serExact = new ExactDedupIndex(spark, s"$ser/exact", "id", "text")
    val plan = (for {
      i <- 0 until Batches; w <- 1 to Workers
    } yield (w, i)).sortBy { case (w, i) => ForkAppend.ord(w, i) }
    serEdges.addEdges(ForkAppend.edgeBatch(spark, 0, 0), ord = 0L)
    serExact.addAndDedup(ForkAppend.docBatch(spark, 0, 0), ord = 0L)
    plan.foreach { case (w, i) =>
      serEdges.addEdges(ForkAppend.edgeBatch(spark, w, i), ForkAppend.ord(w, i))
      serExact.addAndDedup(ForkAppend.docBatch(spark, w, i), ForkAppend.ord(w, i))
    }
    val wantEdges = canon(serEdges.edges())
    val wantKeepers = canon(serExact.keepers())
    assert(wantEdges.nonEmpty && wantKeepers.nonEmpty)

    // ---- concurrent run: provision-then-fan-out, then two real JVMs
    val root = Files.createTempDirectory("xproc").toFile.getAbsolutePath
    val edges = new EdgeIndex(spark, s"$root/edges")
    val exact = new ExactDedupIndex(spark, s"$root/exact", "id", "text")
    edges.addEdges(ForkAppend.edgeBatch(spark, 0, 0), ord = 0L)
    exact.addAndDedup(ForkAppend.docBatch(spark, 0, 0), ord = 0L)

    val procs = (1 to Workers).map(w => w -> fork(root, w))
    // both children are warm before any append: release the barrier
    val deadline = System.currentTimeMillis() + 180000
    while ((1 to Workers).exists(w => !new File(root, s"ready-$w").exists())) {
      assert(System.currentTimeMillis() < deadline, {
        procs.map { case (w, _) => s"worker $w log:\n" +
          scala.util.Try(new String(Files.readAllBytes(
            new File(root, s"worker-$w.log").toPath))).getOrElse("<none>")
        }.mkString("children never became ready\n", "\n", "")
      })
      Thread.sleep(100)
    }
    Files.write(new File(root, "go").toPath, Array.empty[Byte])
    procs.foreach { case (w, p) =>
      assert(p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
        s"worker $w timed out")
      assert(p.exitValue() == 0, s"worker $w failed:\n" + new String(
        Files.readAllBytes(new File(root, s"worker-$w.log").toPath)))
    }

    // ---- the stores' read faces equal the serial baseline's
    assert(canon(edges.edges()) == wantEdges,
      "edge store diverged under cross-process appends")
    assert(canon(exact.keepers()) == wantKeepers,
      "exact-dedup keepers diverged under cross-process appends")

    // maintenance after the fan-out: compaction preserves both faces
    edges.compact(); exact.compact()
    assert(canon(edges.edges()) == wantEdges)
    assert(canon(exact.keepers()) == wantKeepers)
  }
}
