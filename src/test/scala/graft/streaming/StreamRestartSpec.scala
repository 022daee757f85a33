package graft.streaming

import java.nio.file.Files

import graft.SparkSuite
import graft.ops._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composed-pipeline checkpoint-restart convergence: per-store replay
  * idempotence is swept store-by-store in FaultInjectionSpec, but a real
  * curate pipeline appends to MANY stores inside one micro-batch. This
  * spec kills the streaming query inside the crash window the per-store
  * sweep exercises — after store appends, BEFORE the checkpoint commit —
  * restarts it from the same checkpoint (the failed epoch replays with
  * the same id and data), and requires every persisted store (exact
  * dedup, LSH pairs → components, BM25 postings, link edges, IVF
  * postings) to land on the uninterrupted run's state. A second case
  * crashes MID-batch (only some stores appended) so the partial-append
  * state is also proven convergent.
  *
  * Reference analog: cursor-rewind redelivery — a consumer that dies
  * before acking replays from the cursor and the subscription state
  * converges (pulsar-client/src/main/java/org/apache/pulsar/client/impl/
  * ConsumerImpl.java:357-383).
  */
class StreamRestartSpec extends SparkSuite {
  import spark.implicits._

  private final class InjectedCrash
    extends RuntimeException("injected crash before checkpoint commit")

  private val sfDir = "/root/testdata/sf0.001"

  // the docs topic: 4 sealed segments, read back one per trigger so the
  // run has 4 micro-batches to crash between
  private lazy val docsTopic: String = {
    val dir = Files.createTempDirectory("restart-topic").toFile.getAbsolutePath
    graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("string").as("key"), col("text").as("value"),
        pmod(col("doc_id"), lit(4)).cast("int").as("seg"))
      // range-partition: hash-repartition collides 4 seg values into
      // fewer tasks, leaving empty segments — the run needs 4 real ones
      .repartitionByRange(4, col("seg")).drop("seg")
      .write.format("graft-topic").option("path", dir).mode("append").save()
    dir
  }

  private lazy val emb: DataFrame = graft.core.Tables.embeddings(spark, sfDir)
    .select(col("vec_id").as("doc_id"), col("embedding"), col("label"))
    .localCheckpoint(true)

  // deterministic BM25 probe terms drawn from the corpus itself
  private lazy val bmQueries: Seq[(String, String)] = {
    val words = graft.core.Tables.documents(spark, sfDir)
      .orderBy("doc_id").select("text").as[String].head()
      .split("\\s+").filter(_.length > 3).distinct
    Seq("q1" -> words.take(2).mkString(" "), "q2" -> words.slice(2, 4).mkString(" "))
  }

  // STRICT ord mode everywhere it exists: crash-replay re-delivers the
  // failed epoch under its OWN id (equality — the sanctioned reuse), so
  // the restart legs double as proof that strict mode and the crash
  // contract compose — a restart from the SAME checkpoint never trips
  // the high-water check, while a fresh-checkpoint restart would
  private case class Stores(root: String) {
    val exact = new ExactDedupIndex(spark, s"$root/exact", "doc_id", "text",
      strictOrd = true)
    val lsh = new MinHashIndex(spark, s"$root/lsh", "doc_id", "text",
      strictOrd = true)
    val cc = new ComponentsIndex(spark, s"$root/cc", strictOrd = true)
    val bm25 = new Bm25Index(spark, s"$root/bm25", "doc_id", "text",
      strictOrd = true)
    val edges = new EdgeIndex(spark, s"$root/edges")
    val ivf = new IvfIndex(spark, s"$root/ivf", "doc_id", "embedding")
  }

  /** One micro-batch's appends across all five stores; `crashAfter` kills
    * the "process" after that many append steps completed (None = no
    * crash; Some(5) = all appends landed but the offset never committed). */
  private def appendBatch(st: Stores, b0: DataFrame, e: Long,
                          crashAfter: Option[Int]): Unit = {
    val b = b0.localCheckpoint(true)
    var step = 0
    def io(body: => Unit): Unit = {
      if (crashAfter.contains(step)) throw new InjectedCrash
      body; step += 1
    }
    var novel: DataFrame = null
    io { novel = st.exact.addAndDedup(b, ord = e, bloom = true)
      .select(col("doc_id")).localCheckpoint(true) }
    val fresh = b.join(novel, Seq("doc_id"))
    io { st.cc.addPairs(st.lsh.addAndFindPairs(fresh, batchOrd = e), ord = e) }
    io { st.bm25.add(fresh, ord = e) }
    io { st.edges.addEdges(fresh.select(pmod(col("doc_id"), lit(7)).as("src"),
      pmod(col("doc_id") * 3 + 1, lit(11)).as("dst")), ord = e) }
    io { st.ivf.add(fresh.join(emb, "doc_id")
      .select(col("doc_id"), col("embedding"), col("label")), col("label")) }
    if (crashAfter.contains(step)) throw new InjectedCrash
  }

  private val RocksCls =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ConfKey = "spark.sql.streaming.stateStore.providerClass"

  private def withProvider[T](cls: Option[String])(body: => T): T = {
    val prev = spark.conf.getOption(ConfKey)
    cls.fold(spark.conf.unset(ConfKey))(spark.conf.set(ConfKey, _))
    try body
    finally prev.fold(spark.conf.unset(ConfKey))(spark.conf.set(ConfKey, _))
  }

  /** Names of files under the checkpoint's state dir (recursive). */
  private def stateFiles(cp: String): Seq[String] = {
    val root = new java.io.File(cp, "state")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    if (root.exists()) walk(root).map(_.getName) else Seq.empty
  }

  private def rocksArtifacts(cp: String): Boolean =
    stateFiles(cp).exists(n => n.endsWith(".zip") || n.endsWith(".changelog"))

  /** Run the pipeline over the whole topic; optionally crash once at
    * (epoch, afterSteps) and restart from the checkpoint.
    *
    * `stateful = true` adds a state-store-backed stage (streaming
    * dropDuplicates on the unique doc_id — row-wise a pass-through, so
    * the faces stay comparable) upstream of the store appends: the
    * crash-restart then ALSO exercises the state store's own restore
    * path — load the pre-crash version, replay the failed batch — which
    * under `provider = RocksDB` is the changelog/snapshot restore the
    * production crash case runs. `restartProvider` (only meaningful
    * with a crash) restarts under a DIFFERENT session conf — the
    * misconfiguration case. */
  private def runPipeline(crash: Option[(Long, Int)],
                          provider: Option[String] = None,
                          stateful: Boolean = false,
                          restartProvider: Option[Option[String]] = None)
      : (Stores, String) = {
    val root = Files.createTempDirectory("restart-st").toFile.getAbsolutePath
    val st = Stores(root)
    @volatile var armed = crash
    def start() = {
      val src = spark.readStream.format("graft-topic")
        .option("path", docsTopic).option("maxSegmentsPerTrigger", "1").load()
        .select(col("key").cast("long").as("doc_id"), col("value").as("text"))
      (if (stateful) src.dropDuplicates("doc_id") else src)
        .writeStream
        .foreachBatch { (b: DataFrame, e: Long) =>
          val crashAfter = armed.collect { case (ce, cs) if ce == e =>
            armed = None; cs }
          appendBatch(st, b, e, crashAfter)
        }
        .option("checkpointLocation", s"$root/cp").start()
    }
    val q = withProvider(provider)(start())
    try q.processAllAvailable()
    catch { case _: Throwable => }
    if (crash.isDefined) {
      assert(q.exception.isDefined, "the injected crash must kill the query")
      assert(!q.isActive)
      // the process died with appends landed and the offset uncommitted —
      // restart from the checkpoint; the failed epoch replays (same id,
      // same segment data — and, with a stateful stage, the state store
      // restores its pre-crash version first), then the topic drains
      val q2 = withProvider(restartProvider.getOrElse(provider))(start())
      q2.processAllAvailable()
      assert(q2.exception.isEmpty, s"restart must converge: ${q2.exception}")
      q2.stop()
    } else {
      assert(q.exception.isEmpty, s"clean run failed: ${q.exception}")
      q.stop()
    }
    (st, s"$root/cp")
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  /** The five stores' read faces, canonicalized. */
  private def faces(st: Stores): Map[String, Seq[String]] = {
    def face(name: String)(df: => DataFrame): (String, Seq[String]) =
      try name -> canon(df)
      catch { case e: Throwable =>
        throw new RuntimeException(s"face '$name' failed: ${e.getMessage}", e) }
    Map(
      face("exact")(st.exact.keepers()),
      face("components")(st.cc.resolveAll()),
      face("bm25")(st.bm25.search(bmQueries, k = 10)),
      face("edges")(st.edges.edges()),
      face("ivf")(st.ivf.search(emb.where(col("doc_id") < 5),
        array(col("label")), k = 3)
        .select(col("query_id"), col("neighbor_id"), round(col("sim"), 9))))
  }

  private lazy val cleanFaces: Map[String, Seq[String]] = {
    val f = faces(runPipeline(None)._1)
    f.foreach { case (k, v) => assert(v.nonEmpty, s"$k face is vacuous") }
    f
  }

  private def assertConverged(got: Map[String, Seq[String]],
                              what: String): Unit =
    cleanFaces.foreach { case (k, want) =>
      assert(got(k) == want, s"store $k diverged after $what:\n" +
        s"  got  ${got(k).take(5)}\n  want ${want.take(5)}")
    }

  test("crash after ALL appends, before commit: restart converges every store") {
    assertConverged(faces(runPipeline(Some((1L, 5)))._1), "restart")
  }

  test("crash MID-batch (2 of 5 stores appended): restart converges every store") {
    assertConverged(faces(runPipeline(Some((2L, 2)))._1), "mid-batch restart")
  }

  test("crash + restart under ROCKSDB (changelog/snapshot restore): every store converges") {
    val (st, cp) = runPipeline(Some((1L, 5)), provider = Some(RocksCls),
      stateful = true)
    assert(rocksArtifacts(cp),
      "RocksDB must actually engage (the stateful stage's store)")
    assertConverged(faces(st), "RocksDB restart")
  }

  test("MID-batch crash + restart under ROCKSDB converges every store") {
    val (st, cp) = runPipeline(Some((2L, 2)), provider = Some(RocksCls),
      stateful = true)
    assert(rocksArtifacts(cp), "RocksDB must actually engage")
    assertConverged(faces(st), "RocksDB mid-batch restart")
  }

  test("provider flipped on restart: the CHECKPOINT pins the provider, not the session conf") {
    // the misconfiguration case the RocksDB-parity story leaves open: a
    // checkpoint written under the default provider, restarted in a
    // session configured for RocksDB. Spark records the provider class
    // in the checkpoint's offset metadata and FORCES it back on restart
    // (OffsetSeqMetadata.relevantSparkConfs), so the flip is ignored
    // rather than failing or mixing state formats — pinned here so a
    // Spark behavior change (e.g. the conf silently winning and reading
    // default-provider state as RocksDB files) fails this spec loudly.
    val (st, cp) = runPipeline(Some((1L, 5)), provider = None,
      stateful = true, restartProvider = Some(Some(RocksCls)))
    assert(!rocksArtifacts(cp),
      "the default-provider checkpoint must keep the default provider " +
        "on restart — RocksDB artifacts mean the session conf won")
    assertConverged(faces(st), "provider-flipped restart")
  }
}
