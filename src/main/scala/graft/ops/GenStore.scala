package graft.ops

import java.io.File

/** Crash-safe generation-directory layout shared by the persisted indexes
  * ([[ParquetKvStore]], [[MinHashIndex]], [[ComponentsIndex]]): state lives
  * in `gen-N` directories under `path`, with a `_current` pointer file
  * atomically renamed onto the live one.
  *
  * Contract: writers materialize a full new generation (or append into the
  * live one, where the store's semantics make partial appends replayable),
  * then [[swapPointer]]; a crash between write and swap leaves an orphan
  * that [[nextGenIndex]] counts, so a retry never writes into a
  * half-written directory. Readers bound to a replaced generation stay
  * scannable until the owner calls [[reapExcept]] — each store keeps the
  * replaced generation for one cycle (the documented staleness bound).
  */
private[ops] final class GenStore(path: String) {

  def pointer = new File(path, "_current")
  private def prevPointer = new File(path, "_current.prev")

  private def readNamed(f: File): Option[File] =
    if (!f.exists()) None
    else {
      val name = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim
      Some(new File(path, name)).filter(_.exists())
    }

  def currentGen(): Option[File] =
    readNamed(pointer).orElse {
      // A missing `_current` beside existing generations means a crash in
      // swapPointer's non-atomic fallback window. Recover from the
      // breadcrumb written before the delete, instead of letting
      // liveOrCreate mint a fresh empty generation that silently orphans
      // all accumulated state (dedup pairs, IVF postings, ...).
      val recovered = readNamed(prevPointer)
      recovered.foreach(g => swapPointer(g.getName))
      recovered
    }

  /** Next unused generation index — crash orphans (written, never pointed
    * at) count too. */
  def nextGenIndex(): Int = {
    val existing = Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
      .map(_.getName.stripPrefix("gen-").toInt)
    if (existing.isEmpty) 0 else existing.max + 1
  }

  def newGenDir(): File = {
    Fs.step("gen.alloc")
    new File(path, s"gen-${nextGenIndex()}")
  }

  /** Atomically re-point `_current` at `genName`. POSIX rename replaces in
    * one step (no window with no pointer); on filesystems where the atomic
    * move fails, fall back to delete-and-retry — but first copy the old
    * pointer to `_current.prev`, so a crash inside that window is
    * recoverable by [[currentGen]] rather than reading as an empty store. */
  def swapPointer(genName: String): Unit = {
    import java.nio.file.{Files, StandardCopyOption => O}
    Fs.step("swap.begin")
    val tmp = new File(path, "._current.tmp")
    Files.write(tmp.toPath, genName.getBytes("UTF-8"))
    Fs.step("swap.tmp-written")
    try Files.move(tmp.toPath, pointer.toPath,
      O.ATOMIC_MOVE, O.REPLACE_EXISTING)
    catch {
      case _: java.io.IOException =>
        if (pointer.exists())
          Files.copy(pointer.toPath, prevPointer.toPath, O.REPLACE_EXISTING)
        Fs.step("swap.prev-copied")
        pointer.delete()
        Fs.step("swap.old-deleted")
        if (!tmp.renameTo(pointer))
          throw new java.io.IOException(s"pointer swap failed at $path")
    }
    Fs.step("swap.done")
  }

  /** Delete every generation directory not named in `keep` (the live one
    * and, by convention, the one it just replaced). */
  def reapExcept(keep: Set[String]): Unit =
    Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("gen-") &&
        !keep(f.getName))
      .foreach { g => Fs.step("reap.delete"); Fs.deleteRecursively(g) }

  /** The generation appends land in: the live one, or a freshly-created
    * `gen-0` (pointer swapped before the first write, so a crash
    * mid-append leaves a pointed-at generation with partial state — which
    * each store's append semantics must make replayable). `beforeCreate`
    * runs whenever no live generation exists — the first creation, or
    * recovery after a crashed pointer swap — so keep it idempotent
    * (layout guards, not one-time initialization).
    *
    * '''Concurrency''': IN-PROCESS concurrent creators (e.g. crawl
    * workers fanning out onto one empty [[EdgeIndex]]) serialize on a
    * per-path lock — without it, racers allocate different generations
    * and the last replacing pointer swap orphans every batch the other
    * "winners" already published (POSIX rename REPLACES, so there is no
    * portable filesystem test-and-set to build a lock-free cold start
    * on). CROSS-process, the callers serialize creation on
    * [[StoreLock]]: the probe-then-append stores hold it for every
    * append anyway, and [[EdgeIndex]]'s lock-free appenders take it for
    * the one cold-start step (CrossProcessStoreSpec races two real JVMs
    * on an empty root to pin this). The reference's shape is the same
    * metadata-op-before-appends: a ledger is created in one metadata
    * operation before entries are appended
    * (managed-ledger/.../ManagedLedgerImpl.java open-or-create). */
  def liveOrCreate(beforeCreate: File => Unit = _ => ()): File =
    currentGen().getOrElse {
      val lock = GenStore.createLocks.computeIfAbsent(
        new File(path).getAbsolutePath, _ => new Object)
      lock.synchronized {
        currentGen().getOrElse {
          val root = new File(path)
          root.mkdirs()
          beforeCreate(root)
          val gen = newGenDir()
          gen.mkdirs()
          Fs.step("create.gen-made")
          swapPointer(gen.getName)
          gen
        }
      }
    }

  /** Append depth of the live generation: the maximum number of data
    * files accumulated in any ONE directory (a Hive partition leaf, or a
    * plain append dir for unpartitioned stores) — the store-generic
    * count-compaction trigger ([[CompactionPolicy]]). Each append lands
    * at most one file per touched leaf and a compacted generation holds
    * exactly one, so this is how many uncompacted appends the WIDEST
    * leaf makes a read pay for (listing + footer reads for the
    * mode("append") probe stores; plan width for union-plan stores,
    * which count their own batch dirs — [[EdgeIndex.uncompactedBatches]]).
    * Underscore/dot-prefixed names are skipped: side artifacts
    * (`_bloom`, `_quantizer`, `_stats`) have their own lifecycles. A
    * pure recursive directory listing, no Spark job. */
  def appendDepth(): Int = {
    def walk(d: File): Int = {
      val kids = Option(d.listFiles()).getOrElse(Array.empty)
        .filterNot(f => f.getName.startsWith("_") ||
          f.getName.startsWith("."))
      val here = kids.count(f => f.isFile && f.getName.endsWith(".parquet"))
      val below = kids.filter(_.isDirectory).map(walk)
      (here +: below.toSeq).max
    }
    currentGen().map(walk).getOrElse(0)
  }

  /** Whether the live generation holds any data per `present` — a pure
    * directory listing, no Spark job (use for guards where [[readLive]]'s
    * schema-inference read would be wasted work). */
  def hasData(present: File => Boolean): Boolean =
    currentGen().exists(g =>
      Option(g.listFiles()).getOrElse(Array.empty).exists(present))

  /** All retained generation names, oldest index first — the live one
    * plus any not-yet-reaped predecessors/orphans. */
  def generations(): Seq[String] =
    Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
      .map(_.getName)
      .sortBy(_.stripPrefix("gen-").toInt).toSeq

  /** A RETAINED generation's data by name — the store's time-travel /
    * rollback read face (the reference's seek-to-earlier-position,
    * `Reader#seek`, applied to index state): a replaced generation stays
    * scannable until reaped, so "what did the index hold before this
    * compaction" is one read away. None only when the generation is
    * missing or empty; read failures propagate. */
  def readGeneration(spark: org.apache.spark.sql.SparkSession,
                     genName: String,
                     present: File => Boolean): Option[org.apache.spark.sql.DataFrame] =
    Some(new File(path, genName))
      .filter(g => g.isDirectory &&
        Option(g.listFiles()).getOrElse(Array.empty).exists(present))
      .map(g => spark.read.parquet(g.getAbsolutePath))

  /** The store's schema, learned from the FIRST real read and pinned for
    * the life of this handle: schema inference on a parquet read is a
    * footer-read Spark job, and the per-micro-batch probe stores re-read
    * their live generation every trigger — per-process, that job is pure
    * constant overhead after the first batch (a store's schema never
    * changes across appends/compactions). */
  @volatile private var schemaCache
  : Option[org.apache.spark.sql.types.StructType] = None

  /** The live generation's data as a DataFrame, when `present` says it
    * holds any (a zero-row append leaves only a _SUCCESS marker — reading
    * that would fail schema inference). Only a MISSING store maps to None;
    * an actual read failure (permissions, corrupt footer) propagates
    * rather than degrading into "empty store". */
  def readLive(spark: org.apache.spark.sql.SparkSession,
               present: File => Boolean): Option[org.apache.spark.sql.DataFrame] =
    currentGen().filter(g =>
      Option(g.listFiles()).getOrElse(Array.empty).exists(present))
      .map { g =>
        schemaCache match {
          case Some(s) => spark.read.schema(s).parquet(g.getAbsolutePath)
          case None =>
            val df = spark.read.parquet(g.getAbsolutePath)
            schemaCache = Some(df.schema)
            df
        }
      }
}

private[ops] object GenStore {
  /** Per-path cold-start creation locks (see [[GenStore.liveOrCreate]]). */
  private val createLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
}
