package graft.ops

import java.io.File

import graft.sources.v2.{SegmentStats, TopicTable}

/** Tiered-storage offload: move cold sealed segments to the topic's
  * `offloaded/` tier with transparent read-back — the managed-ledger
  * offloader posture (reference: tiered-storage/jcloud/.../
  * BlobStoreManagedLedgerOffloader.java:95 moves sealed ledgers to object
  * store; reads fall through to the offloaded copy transparently).
  *
  * Everything is metadata: eligibility comes from the per-segment sidecar
  * (newest publish time older than the horizon), the move is a rename (in a
  * real deployment: a storage-class transition on the object store), and the
  * segment KEEPS its (partition, name) identity — so batch readers, pruning,
  * and crucially the name-keyed stream cursor are all unaffected: an already
  * -consumed segment stays consumed after offload, an unconsumed one is
  * still delivered from the cold tier. */
object Offloader {

  /** Offload sealed segments whose newest message is older than `olderThanMs`.
    * Returns the number of segments moved. */
  def offload(dir: String, olderThanMs: Long): Int = {
    val tier = new File(dir, TopicTable.OffloadTier)
    val victims = TopicTable.listPartitioned(dir)
      .filterNot { case (_, f) => // already offloaded segments stay put
        f.getParentFile.getPath.contains(TopicTable.OffloadTier)
      }
      // provably cold only — unknown-age segments stay hot
      .filter { case (_, f) => SegmentStats.whollyOlderThan(f, olderThanMs) }
    victims.foreach { case (pid, f) =>
      val dst =
        if (pid == TopicTable.FlatPartition) tier
        else new File(tier, f.getParentFile.getName)
      dst.mkdirs()
      val side = SegmentStats.sidecarFor(f)
      f.renameTo(new File(dst, f.getName))
      if (side.exists()) side.renameTo(new File(dst, side.getName))
    }
    victims.length
  }

  /** Recall a partition's cold segments back to the hot tier (the inverse
    * transition; also metadata-only). Returns segments moved. */
  def recall(dir: String): Int = {
    val tier = new File(dir, TopicTable.OffloadTier)
    if (!tier.exists()) return 0
    val cold = TopicTable.listPartitioned(dir).filter { case (_, f) =>
      f.getParentFile.getPath.contains(TopicTable.OffloadTier)
    }
    cold.foreach { case (pid, f) =>
      val dst =
        if (pid == TopicTable.FlatPartition) new File(dir)
        else TopicTable.partitionDir(dir, pid)
      dst.mkdirs()
      val side = SegmentStats.sidecarFor(f)
      f.renameTo(new File(dst, f.getName))
      if (side.exists()) side.renameTo(new File(dst, side.getName))
    }
    cold.length
  }
}
