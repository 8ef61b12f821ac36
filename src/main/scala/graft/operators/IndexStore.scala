package graft.operators

import java.io.File
import java.nio.file.{AtomicMoveNotSupportedException, Files, StandardCopyOption}

/** Shared machinery for MATERIALIZED on-disk index artifacts (the
  * near-dup band/set index, the IVF posting-list index): build-once
  * race safety, atomic install, in-place compaction. Factored out of
  * NearDup so every index family carries the SAME contract instead of
  * re-deriving it:
  *
  *  - `_OK` gates completeness: a reader trusts `path` iff `path/_OK`
  *    exists; anything else is a crashed build and fair game for
  *    teardown.
  *  - [[ensure]] builds into a pid-scoped staging directory and
  *    installs it with ONE atomic directory move — concurrent JVMs
  *    (the Bench + Verify pair) may both build, exactly one install
  *    wins, the loser discards its copy and reads the winner's.
  *  - [[rewriteInPlace]] is the lake's small-file compaction shape:
  *    stage the rewrite, swap it in atomically, report file counts.
  *
  * At warehouse scale the same contract is what a table format's
  * commit protocol provides; on a plain filesystem the atomic
  * directory rename IS the commit.
  */
object IndexStore {

  def okAt(dir: File): File = new File(dir, "_OK")

  def deleteRec(f: File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRec)
    f.delete(); ()
  }

  /** Count regular files under `dir` (recursive) — the small-file
    * readout [[rewriteInPlace]] reports. */
  def countFiles(f: File): Long = {
    val children = f.listFiles()
    if (children == null) { if (f.isFile) 1L else 0L }
    else children.map(countFiles).sum
  }

  /** Build the artifact at `path` exactly once, RACE-SAFELY:
    * concurrent JVMs may both observe a missing `_OK`. Each runs
    * `build` into its own pid-scoped staging directory and a single
    * atomic directory rename installs one of them; the loser (rename
    * fails because the winner's directory now exists) discards its
    * staging copy and reads the winner's. `_OK` is written INSIDE the
    * staging dir before the rename, so a reader can never observe a
    * half-built artifact under `path` — either the rename happened
    * (complete + `_OK`) or `path` is absent. A `path` left WITHOUT
    * `_OK` (a crashed un-gated build) is torn down and rebuilt, with
    * the okAt re-check INSIDE the exists branch (round-9 ADVICE): a
    * concurrent JVM's atomic rename may have installed a complete
    * artifact between the fast-path check and the teardown, and
    * deleting it would yank the directory out from under the winner's
    * readers.
    */
  def ensure(path: String)(build: String => Unit): Unit = {
    val dst = new File(path)
    if (okAt(dst).exists()) return
    if (dst.exists()) {
      if (okAt(dst).exists()) return
      deleteRec(dst)
    }
    val stage = new File(path + s".stage-${ProcessHandle.current.pid}")
    if (stage.exists()) deleteRec(stage)
    try {
      build(stage.getPath)
      okAt(stage).createNewFile()
      // lost-race detection happens at the INSTALL, not before it: the
      // move is the serialization point, so "dst appeared since we
      // built" and "dst appeared mid-move" collapse into one failure
      // mode handled below
      def loseRace(): Unit = {
        require(okAt(dst).exists(),
          s"index install race left $path without _OK")
        deleteRec(stage)
      }
      // java.io.File.renameTo is best-effort and may fail spuriously on
      // filesystems where a directory rename is not a single syscall;
      // Files.move with ATOMIC_MOVE either installs atomically or
      // throws a typed error we can adjudicate
      try Files.move(stage.toPath, dst.toPath, StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: AtomicMoveNotSupportedException =>
          // documented fallback: non-atomic directory move on the rare
          // filesystem without atomic rename — same-visibility caveat
          // as a renameTo, but explicit instead of silent
          try Files.move(stage.toPath, dst.toPath)
          catch { case _: java.io.IOException => loseRace() }
        case _: java.io.IOException => loseRace()
      }
    } finally if (stage.exists()) deleteRec(stage)
  }

  /** Rewrite a complete (`_OK`-gated) artifact IN PLACE: run `rewrite`
    * into a staging directory, gate it, then swap — old aside
    * (atomic), staged in (atomic), old deleted. A reader never
    * observes a half-rewritten artifact; a crash between the two moves
    * leaves either the old gated artifact or no artifact, which
    * [[ensure]] rebuilds. Single-maintainer discipline: concurrent
    * APPENDS during a rewrite would be lost — the lake job's usual
    * table-level lock is out of scope here and documented as such.
    *
    * Returns (filesBefore, filesAfter).
    */
  def rewriteInPlace(path: String)(rewrite: String => Unit): (Long, Long) = {
    val dst = new File(path)
    require(okAt(dst).exists(),
      s"rewriteInPlace: no complete artifact at $path (missing _OK)")
    val before = countFiles(dst)
    val stage = new File(path + s".compact-${ProcessHandle.current.pid}")
    if (stage.exists()) deleteRec(stage)
    rewrite(stage.getPath)
    okAt(stage).createNewFile()
    val old = new File(path + s".old-${ProcessHandle.current.pid}")
    if (old.exists()) deleteRec(old)
    Files.move(dst.toPath, old.toPath, StandardCopyOption.ATOMIC_MOVE)
    Files.move(stage.toPath, dst.toPath, StandardCopyOption.ATOMIC_MOVE)
    deleteRec(old)
    (before, countFiles(dst))
  }
}
