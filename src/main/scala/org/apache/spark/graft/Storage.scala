package org.apache.spark.graft

import org.apache.spark.SparkContext
import org.apache.spark.storage.BroadcastBlockId

/** Block-manager bridge for broadcast-block accounting and release.
  *
  * Broadcast blocks (one per broadcast join / `sc.broadcast`) are
  * reclaimed only when a driver GC lets the ContextCleaner notice the
  * `Broadcast` object is unreachable — the same asynchronous mechanism
  * whose latency inflated checkpoint-block storage in a long-lived
  * 179-query session (round 6, RDD blocks; round 7 verdict suspects the
  * identical pattern for broadcast blocks in the persist-heavy near-dup
  * family). `BlockManagerMaster`'s query/remove calls are
  * `private[spark]`, so this one-hop shim compiles inside the package
  * boundary — the standard extension-library technique; nothing here
  * forks Spark behavior, it only re-exposes three read/remove calls.
  */
object Storage {

  /** Distinct broadcast ids with at least one resident block. */
  def broadcastIds(sc: SparkContext): Seq[Long] =
    sc.env.blockManager.master
      .getMatchingBlockIds(_.isInstanceOf[BroadcastBlockId],
        askStorageEndpoints = true)
      .collect { case b: BroadcastBlockId => b.broadcastId }
      .distinct

  /** (block count, total mem bytes, total disk bytes) across all
    * resident broadcast blocks — the storage summary Bench logs before
    * each query so accumulation shows up in the committed artifacts. */
  def broadcastSummary(sc: SparkContext): (Int, Long, Long) = {
    val master = sc.env.blockManager.master
    val ids = master.getMatchingBlockIds(_.isInstanceOf[BroadcastBlockId],
      askStorageEndpoints = true)
    var mem = 0L
    var disk = 0L
    ids.foreach { id =>
      master.getBlockStatus(id, askStorageEndpoints = true).values.foreach {
        st => mem += st.memSize; disk += st.diskSize
      }
    }
    (ids.size, mem, disk)
  }

  /** Drop every resident block of the given broadcast, synchronously
    * when `blocking`. Safe ONLY for broadcasts no live plan will read
    * again (a destroyed torrent broadcast cannot be re-fetched): in this
    * engine that means between sequential queries, or after an
    * operator's terminal has been materialized to a checkpoint. */
  def removeBroadcast(sc: SparkContext, id: Long, blocking: Boolean): Unit =
    sc.env.blockManager.master
      .removeBroadcast(id, removeFromMaster = true, blocking = blocking)
}
