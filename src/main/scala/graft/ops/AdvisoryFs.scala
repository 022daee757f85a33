package graft.ops

import java.io.File

/** IO face for the SMALL ADVISORY FILES the store-ownership layer keeps
  * beside each persisted store — the `_owner` fencing record
  * ([[StoreFence]]) and the `_ord_hwm` high-water mark ([[OrdHighWater]]).
  * Both are single-small-file read/replace workloads whose readers treat
  * a torn or unparseable read as "mark unreadable" (which REJECTS writers
  * on the fencing path and degrades to "no check" on the advisory path),
  * so the abstraction needs only three operations and no locking.
  *
  * Two implementations:
  *  - [[LocalAdvisoryFs]] — `java.nio` on a local/shared POSIX mount, the
  *    convenience face behind the `File` overloads.
  *  - [[HadoopAdvisoryFs]] — any Hadoop `FileSystem` (HDFS, S3A, …), the
  *    non-POSIX deployment path: the fencing layer exists exactly for
  *    deployments where `FileChannel.lock` does not.
  *
  * Reference analog: BookKeeper keeps its fencing state in the storage
  * layer itself rather than a side service (managed-ledger/src/main/java/
  * org/apache/bookkeeper/mledger/impl/ManagedLedgerImpl.java ledger
  * open-with-recovery).
  */
trait AdvisoryFs {

  /** Full UTF-8 content of `path`, or None when absent. Implementations
    * may surface partial content mid-replace — callers must treat an
    * unparseable read per their own fail-safe direction. */
  def read(path: String): Option[String]

  /** Replace `path` with `content` (UTF-8), creating parents as needed.
    * The replace must keep the file PRESENT throughout: an observable
    * absent window would read as "unfenced" on the ownership path and
    * silently ADMIT writers, while present-but-partial reads fail safe
    * (unparseable ⇒ reject). */
  def write(path: String, content: String): Unit

  /** Delete `path` if present (explicit release only). */
  def delete(path: String): Unit

  /** Join a child name onto a root path. */
  def child(root: String, name: String): String

  /** Canonical identity of `root` — the key the in-process held-epoch
    * map and monitors are scoped by. */
  def canonical(root: String): String
}

/** The local/shared-POSIX-mount face: `java.nio` with write-tmp +
  * ATOMIC_MOVE ([[Fs.atomicWriteString]]), so a replace is truly atomic
  * and readers never see a torn record at all. */
object LocalAdvisoryFs extends AdvisoryFs {
  override def read(path: String): Option[String] = {
    // no exists-then-read: a concurrent delete (an owner's release on a
    // shared root) landing between the two calls would escape as an
    // unexpected exception type instead of the documented absent ⇒ None
    try Some(new String(
      java.nio.file.Files.readAllBytes(new File(path).toPath), "UTF-8"))
    catch {
      case _: java.nio.file.NoSuchFileException |
           _: java.io.FileNotFoundException => None
    }
  }
  override def write(path: String, content: String): Unit = {
    val f = new File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    Fs.atomicWriteString(f, content)
  }
  override def delete(path: String): Unit = { new File(path).delete(); () }
  override def child(root: String, name: String): String =
    new File(root, name).getPath
  override def canonical(root: String): String =
    new File(root).getCanonicalPath
}

/** The non-POSIX deployment face: any Hadoop `FileSystem` (HDFS, S3A,
  * `LocalFileSystem` in tests). Replaces go through `create(overwrite)`
  * rather than delete + rename: `FileSystem.rename` refuses an existing
  * destination on the HDFS contract, and working around that with a
  * delete-first opens an ABSENT window a concurrent [[StoreFence.verify]]
  * would read as "unfenced" — the wrong failure direction. A
  * create-overwrite keeps the path present throughout; a reader landing
  * mid-write sees a short or empty record, which parses as unreadable and
  * REJECTS on the fencing path (fail-safe) and degrades to "no check" on
  * the high-water path (advisory by design).
  *
  * '''Mixing faces on one local root:''' the held-epoch key aligns (see
  * [[canonical]]), but a CHECKSUMMED `FileSystem` (the default
  * `FileSystem.getLocal`) keeps `.crc` sidecars that a `File`-face
  * rewrite silently invalidates — the next Hadoop-face read then fails
  * loudly with a `ChecksumException` (fail-safe, but an operational
  * nuisance). Pass `getLocal(conf).getRawFileSystem` when both faces
  * drive one local mount; on HDFS/S3A the question does not arise (the
  * `File` face cannot reach those roots at all). */
final class HadoopAdvisoryFs(fs: org.apache.hadoop.fs.FileSystem)
    extends AdvisoryFs {
  import org.apache.hadoop.fs.Path

  override def read(path: String): Option[String] = {
    // open directly and map absent ⇒ None instead of exists-then-open:
    // a concurrent delete between the two calls (a rightful owner's
    // release removing `_owner` on a shared root) would otherwise throw
    // FileNotFoundException out of verify/readOwner, escaping the
    // documented absent ⇒ None contract as an unexpected exception type
    val in =
      try fs.open(new Path(path))
      catch { case _: java.io.FileNotFoundException => return None }
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      Some(new String(out.toByteArray, "UTF-8"))
    } finally in.close()
  }
  override def write(path: String, content: String): Unit = {
    val out = fs.create(new Path(path), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }
  override def delete(path: String): Unit = {
    fs.delete(new Path(path), false); ()
  }
  override def child(root: String, name: String): String =
    new Path(root, name).toString
  override def canonical(root: String): String = {
    val q = fs.makeQualified(new Path(root))
    val uri = q.toUri
    // a file-scheme root is the SAME store the `File` overloads may
    // drive (a LocalFileSystem-backed deployment, or tests): key it
    // identically to [[LocalAdvisoryFs]] so a process mixing the two
    // faces on one local root shares one held-epoch entry instead of
    // self-fencing under two spellings; non-file schemes key by URI
    if (uri.getScheme == "file")
      new File(uri.getPath).getCanonicalPath
    else q.toString
  }
}
