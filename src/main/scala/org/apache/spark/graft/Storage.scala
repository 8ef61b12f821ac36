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

  /** (storage memory used, storage memory max) in bytes — the unified
    * memory manager's storage-pool occupancy. Round-8 verdict: the
    * driver-session inflation of the persist-heavy bench family
    * survived the broadcast+RDD sweeps, so the remaining suspects
    * (executor storage-memory pressure, shuffle-spill files) must be
    * IN the per-query evidence log before they can be ruled in or out. */
  def storageMemory(sc: SparkContext): (Long, Long) = {
    val mm = sc.env.memoryManager
    (mm.storageMemoryUsed,
      mm.maxOnHeapStorageMemory + mm.maxOffHeapStorageMemory)
  }

  /** (file count, total bytes) under the block manager's local dirs —
    * shuffle data/index files, disk-store blocks, and spill temp files
    * all live here, so growth across a long session is exactly the
    * "third mechanism" disk-accumulation signal the round-8 verdict
    * asks to instrument. Walks the directory tree; local mode only
    * (one JVM's dirs == the whole cluster's). */
  def localDiskUsage(sc: SparkContext): (Int, Long) = {
    var n = 0
    var bytes = 0L
    def walk(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach { k =>
        if (k.isDirectory) walk(k)
        else { n += 1; bytes += k.length() }
      }
    }
    sc.env.blockManager.diskBlockManager.localDirs.foreach(walk)
    (n, bytes)
  }

  /** Shuffle ids with registered map outputs. Each completed wide stage
    * leaves one — files on local disk + a driver-side ShuffleStatus —
    * reclaimed only when GC lets the ContextCleaner notice the
    * ShuffleDependency is unreachable (the identical latency mechanism
    * as the round-6 RDD blocks and round-7 broadcast blocks). */
  def shuffleIds(sc: SparkContext): Seq[Int] =
    sc.env.mapOutputTracker match {
      case m: org.apache.spark.MapOutputTrackerMaster =>
        m.shuffleStatuses.keySet.toSeq
      case _ => Seq.empty
    }

  /** Synchronously unregister a shuffle and delete its files — the
    * by-handle analogue of [[removeBroadcast]] for shuffle state. Safe
    * ONLY between sequential queries: exchange reuse never crosses
    * separate query executions, so once a query's terminal action has
    * returned (and its persisted/checkpointed frames are dropped),
    * nothing can re-read its map outputs. */
  def removeShuffle(sc: SparkContext, id: Int, blocking: Boolean): Unit =
    sc.cleaner.foreach(_.doCleanupShuffle(id, blocking = blocking))
}
