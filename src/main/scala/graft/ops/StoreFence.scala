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
  *  - `_owner` in the store root carries `epoch|ownerId|heartbeatMs`,
  *    written by write-tmp + atomic rename (torn reads fail safe: an
  *    unparseable owner file REJECTS writers rather than admitting all).
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
  * widens the torn-read window, which fails safe). What it deliberately
  * does NOT provide is mutual exclusion for the acquire itself: two
  * simultaneous FORCED takeovers can race the epoch bump. That matches
  * the reference's shape — fencing protects the data path, while
  * electing the single rightful owner stays with the deployment's
  * coordinator (the cron/MaintenanceLoop driver assignment here;
  * the metadata store there).
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

  private case class Owner(epoch: Long, ownerId: String, heartbeatMs: Long)

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
        case Array(e, id, hb) if e.nonEmpty && hb.nonEmpty =>
          try Some(Owner(e.toLong, id, hb.toLong))
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
      s"${o.epoch}|${o.ownerId}|${o.heartbeatMs}")
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
      val next = Owner(cur.map(_.epoch + 1).getOrElse(1L), ownerId, now)
      writeOwner(canon, next)
      held.put(canon.getPath, next)
      next.epoch
    }
  }

  /** Refresh the lease — and learn about a takeover: a beat from a
    * deposed owner throws instead of re-asserting stale ownership. */
  def heartbeat(root: File): Unit = StoreLock.withPathLock(root) {
    val canon = root.getCanonicalFile
    val mine = Option(held.get(canon.getPath)).getOrElse(
      throw new FencedStoreException(
        s"heartbeat on $canon without a held ownership — acquire first"))
    verify(canon)
    val next = mine.copy(heartbeatMs = System.currentTimeMillis())
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
    * epoch bumps before the held map updates); an epoch gap under the
    * SAME ownerId is that benign in-flight refresh, not a takeover —
    * ownerIds are per-driver unique by contract. */
  def verify(root: File): Unit = {
    val canon = root.getCanonicalFile
    readOwner(canon).foreach { disk =>
      Option(held.get(canon.getPath)) match {
        case None => throw new FencedStoreException(
          s"store $canon is fenced (owner '${disk.ownerId}', epoch " +
            s"${disk.epoch}) and this process never acquired ownership — " +
            "an errant writer must fail loudly, not corrupt silently")
        case Some(mine) if mine.epoch != disk.epoch
            && mine.ownerId == disk.ownerId =>
          () // our own acquire/heartbeat mid-update — benign
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
        case _ => ()
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
