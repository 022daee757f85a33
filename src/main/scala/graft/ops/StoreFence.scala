package graft.ops

import java.io.File

/** A writer whose ownership epoch went stale tried to touch a fenced
  * store — the loud failure that replaces silent corruption when two
  * drivers believe they own one persisted index. */
final class FencedStoreException(msg: String)
  extends IllegalStateException(msg)

/** Lease/fencing epochs for MULTI-DRIVER store ownership — the layer
  * above [[StoreLock]]. The lock serializes writers that share a POSIX
  * filesystem; it cannot stop an errant second DRIVER on HDFS/S3, where
  * `FileChannel.lock` does not exist and the single-writer topology
  * rested on the MaintenanceLoop ownership *convention*. This object
  * turns that convention into a checked epoch:
  *
  *  - `_owner` in the store root carries
  *    `epoch|ownerId|nonce|heartbeatMs`, written by write-tmp + atomic
  *    rename (torn reads fail safe: an unparseable owner file REJECTS
  *    writers rather than admitting all). The nonce is a per-process
  *    instance id: ownerIds are configured names a restarted driver
  *    reuses, so "is this record mine" is decided by nonce, never id.
  *  - [[acquire]] is the attach operation: it bumps the epoch and makes
  *    this process the owner. Attaching over a LIVE owner (heartbeat
  *    younger than the lease) fails loudly unless `force = true` — an
  *    errant second driver is stopped at attach; a deliberate failover
  *    (lease expired, or forced recovery) succeeds and thereby FENCES
  *    the old owner.
  *  - [[verify]] runs at the head of every store write
  *    ([[StoreLock.exclusive]] and [[EdgeIndex]]'s lock-free appends):
  *    an unfenced store (no `_owner`) passes — fencing is opt-in per
  *    store — but once any driver has acquired, a writer that never
  *    attached, or whose epoch is below the on-disk one, throws
  *    [[FencedStoreException]] instead of corrupting silently.
  *  - [[heartbeat]] refreshes the lease and doubles as a fencing probe:
  *    a deposed owner learns it lost the store at its next beat, not at
  *    its next append.
  *
  * The mechanism needs only small-file read-after-write plus a rename —
  * both available on HDFS and object stores (rename non-atomicity only
  * widens the torn-read window, which fails safe); the owner/high-water
  * IO goes through [[AdvisoryFs]], whose Hadoop `FileSystem`
  * implementation is the non-POSIX deployment path (the `File` overloads
  * below are the local/shared-mount convenience face). What it
  * deliberately does NOT provide is mutual exclusion for the acquire
  * itself: two simultaneous FORCED takeovers can race the epoch bump —
  * but the race is no longer silent: both racers mint the same epoch
  * under different process nonces, and [[verify]] fences whichever one
  * the disk file did not keep at its first post-race write. Electing the
  * single rightful owner stays with the deployment's coordinator (the
  * cron/MaintenanceLoop driver assignment here; the metadata store
  * there), matching the reference's shape — fencing protects the data
  * path.
  *
  * Reference analog: exclusive-producer access — one writer owns the
  * topic and a competing attach fails or fences the incumbent
  * (pulsar-client-api/src/main/java/org/apache/pulsar/client/api/
  * ProducerAccessMode.java); BookKeeper ledger fencing — recovery bumps
  * the fence state and the old writer's appends fail from then on
  * (managed-ledger/src/main/java/org/apache/bookkeeper/mledger/impl/
  * ManagedLedgerImpl.java ledger open-with-recovery).
  */
object StoreFence {

  private case class Owner(epoch: Long, ownerId: String, nonce: String,
                           heartbeatMs: Long)

  /** Per-process instance nonce, minted once per JVM and stamped into
    * every owner record this process writes. ownerIds are CONFIGURED
    * names — a restarted driver naturally reuses its id — so identity
    * comparisons that decide "is this record mine" key on the nonce,
    * never on the id: the restarted driver's records are NOT the old
    * process's records, even under the same configured name. */
  private val processNonce =
    java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  /** Epoch this process holds per canonical store root (the in-memory
    * half of the attach; disk is the source of truth for who CURRENTLY
    * owns). */
  private val held =
    new java.util.concurrent.ConcurrentHashMap[String, Owner]()

  private def ownerFile(root: File) = new File(root, "_owner")

  private def readOwner(root: File): Option[Owner] = {
    val f = ownerFile(root)
    if (!f.exists()) None
    else {
      val raw = new String(
        java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim
      raw.split('|') match {
        // current format: epoch|ownerId|nonce|heartbeatMs
        case Array(e, id, n, hb) if e.nonEmpty && hb.nonEmpty =>
          try Some(Owner(e.toLong, id, n, hb.toLong))
          catch { case _: NumberFormatException =>
            throw new FencedStoreException(
              s"unparseable owner file at $f: '$raw' — refusing to write")
          }
        // legacy nonce-less format: reads as an empty nonce, which never
        // equals a live process's nonce — a legacy record is always
        // "someone else's", the fail-safe direction
        case Array(e, id, hb) if e.nonEmpty && hb.nonEmpty =>
          try Some(Owner(e.toLong, id, "", hb.toLong))
          catch { case _: NumberFormatException =>
            throw new FencedStoreException(
              s"unparseable owner file at $f: '$raw' — refusing to write")
          }
        case _ => throw new FencedStoreException(
          s"unparseable owner file at $f: '$raw' — refusing to write")
      }
    }
  }

  private def writeOwner(root: File, o: Owner): Unit = {
    root.mkdirs()
    Fs.atomicWriteString(ownerFile(root),
      s"${o.epoch}|${o.ownerId}|${o.nonce}|${o.heartbeatMs}")
  }

  /** Attach as the store's owner: bump the epoch past the incumbent's
    * and record it for this process. Fails loudly when the incumbent is
    * a DIFFERENT owner whose heartbeat is younger than `leaseMs` —
    * unless `force` (deliberate failover/recovery, which fences the
    * incumbent). Re-acquiring a store this id already owns refreshes
    * the lease. Returns the held epoch. */
  def acquire(root: File, ownerId: String, leaseMs: Long = 60000L,
              force: Boolean = false): Long = {
    // the owner file is '|'-delimited; an id that can't round-trip would
    // write a file no reader can parse — fencing out EVERYONE (fail-safe
    // but bricked until manual deletion). Reject it at the door.
    require(ownerId.nonEmpty && !ownerId.exists(c => c == '|' || c == '\n'
        || c == '\r'),
      s"ownerId must be non-empty and free of '|' and newlines: '$ownerId'")
    StoreLock.withPathLock(root) {
      val canon = root.getCanonicalFile
      val now = System.currentTimeMillis()
      val cur = readOwner(canon)
      cur.foreach { o =>
        val fresh = now - o.heartbeatMs < leaseMs
        if (o.ownerId != ownerId && fresh && !force)
          throw new FencedStoreException(
            s"store $canon is owned by '${o.ownerId}' (epoch ${o.epoch}, " +
              s"heartbeat ${now - o.heartbeatMs} ms ago, lease $leaseMs ms)" +
              " — a second driver must not attach over a live owner; " +
              "pass force=true only for deliberate failover")
      }
      val next = Owner(cur.map(_.epoch + 1).getOrElse(1L), ownerId,
        processNonce, now)
      writeOwner(canon, next)
      held.put(canon.getPath, next)
      next.epoch
    }
  }

  /** Refresh the lease — and learn about a takeover: a beat from a
    * deposed owner throws instead of re-asserting stale ownership. The
    * record written back is re-read FROM DISK (matched by nonce), never
    * the held copy — a beat racing this process's own re-acquire must
    * refresh the NEWER epoch, not regress the owner file to the stale
    * held one (the zombie-heartbeat corruption: a deposed process whose
    * beat rewrote its stale epoch over the successor's would un-fence
    * itself; here the nonce mismatch makes [[verify]] throw first). */
  def heartbeat(root: File): Unit = StoreLock.withPathLock(root) {
    val canon = root.getCanonicalFile
    val mine = Option(held.get(canon.getPath)).getOrElse(
      throw new FencedStoreException(
        s"heartbeat on $canon without a held ownership — acquire first"))
    verify(canon)
    // verify passed ⇒ disk is this process instance's record (same
    // nonce, possibly a newer epoch from our own re-acquire) or absent
    // (owner file deleted out-of-band — re-establish from the held copy)
    val disk = readOwner(canon).getOrElse(mine)
    val next = disk.copy(heartbeatMs = System.currentTimeMillis())
    writeOwner(canon, next)
    held.put(canon.getPath, next)
  }

  /** The data-path check, run at the head of every store write: pass on
    * an unfenced store; on a fenced one, require this process to hold
    * the CURRENT epoch.
    *
    * '''Granularity: per append/compact CALL.''' The check runs before
    * the write body, so a takeover landing MID-write is detected at the
    * writer's next call (or heartbeat), not mid-flight — the window is
    * one in-flight batch. [[EdgeIndex]] narrows its own window by
    * re-verifying right before the publish rename (the staged write is
    * the long part; the publish is the instant the batch becomes
    * visible). Same shape as the reference: a fenced BookKeeper writer
    * learns at its next addEntry, and in-flight entries of the fenced
    * ledger are the recovery reader's to arbitrate.
    *
    * Lock-free callers can race their OWN driver's re-acquire (disk
    * epoch bumps before the held map updates); the benign case is keyed
    * on the per-process NONCE, not the ownerId — a configured ownerId
    * survives a driver restart, so an id match proves nothing about
    * which process wrote the record, while the nonce is minted per JVM
    * and an epoch gap under OUR nonce can only be our own in-flight
    * refresh. Any different-nonce record fences by epoch, and EQUAL
    * epochs under different nonces throw too: that is the aftermath of
    * a raced double force-takeover (both racers read epoch N and wrote
    * N+1 — disk carries one of them, and the loser must learn at its
    * next write, not keep writing forever). */
  def verify(root: File): Unit = {
    val canon = root.getCanonicalFile
    readOwner(canon).foreach { disk =>
      Option(held.get(canon.getPath)) match {
        case None => throw new FencedStoreException(
          s"store $canon is fenced (owner '${disk.ownerId}', epoch " +
            s"${disk.epoch}) and this process never acquired ownership — " +
            "an errant writer must fail loudly, not corrupt silently")
        case Some(mine) if disk.nonce == mine.nonce =>
          () // our own record (acquire/heartbeat mid-update) — benign
        case Some(mine) if mine.epoch < disk.epoch =>
          throw new FencedStoreException(
            s"store $canon was taken over: held epoch ${mine.epoch} " +
              s"('${mine.ownerId}') < current epoch ${disk.epoch} " +
              s"('${disk.ownerId}') — this writer is fenced")
        case Some(mine) if mine.epoch > disk.epoch =>
          throw new FencedStoreException(
            s"store $canon owner file regressed below the held epoch " +
              s"(${disk.epoch} < ${mine.epoch}, owner '${disk.ownerId}') " +
              "— refusing to write")
        case Some(mine) =>
          // equal epoch, different process instance: a raced double
          // force-takeover minted the same epoch twice (or a second
          // process reused this driver's configured ownerId at the same
          // epoch). The disk file is the arbiter; this writer lost.
          throw new FencedStoreException(
            s"store $canon holds epoch ${disk.epoch} under a DIFFERENT " +
              s"process (owner '${disk.ownerId}') while this process " +
              s"holds the same epoch ('${mine.ownerId}') — a raced " +
              "takeover minted one epoch twice; the on-disk record wins " +
              "and this writer is fenced")
      }
    }
  }

  /** Drop this process's held ownership WITHOUT touching disk (tests; a
    * clean shutdown may also release so a successor can attach without
    * waiting out the lease — pass `deleteOwnerFile = true` for that). */
  def release(root: File, deleteOwnerFile: Boolean = false): Unit = {
    val canon = root.getCanonicalFile
    held.remove(canon.getPath)
    if (deleteOwnerFile) ownerFile(canon).delete()
  }
}
