package graft.operators

/** In-JVM registry of runtime SIZE-GUARD decisions (round-13 verdict
  * #5). The round-13 sf1 capture taught that join strategy for
  * corpus-scaled frames must be decided from a REAL count, not the
  * static planner's estimate — so several operators now pay one
  * orchestration-metadata `count()` and pick broadcast vs
  * shuffled-hash at a row threshold. That makes the DECISION itself a
  * silent plan input: an edit that changes the counted frame (or the
  * threshold) flips bench-scale plans with no fingerprint diff large
  * enough to notice. Every guard therefore records (site, n, decision)
  * here; PlanLintSpec pins the sf0.001 decisions next to the plan
  * fingerprints (docs/GUARD_DECISIONS.json) so a changed decision
  * fails CI the way a lost broadcast already does, and Bench drains
  * the log into docs/BENCH_storage_last.jsonl so every capture carries
  * the decisions its timings were taken under.
  *
  * The registry is append-only per JVM with explicit drain/clear —
  * single-digit entries per query, no row data, thread-safe.
  */
object Guards {

  final case class Decision(site: String, n: Long, decision: String)

  private val buf = new java.util.concurrent.ConcurrentLinkedQueue[Decision]

  def record(site: String, n: Long, decision: String): Unit = {
    buf.add(Decision(site, n, decision)); ()
  }

  /** The standard broadcast-vs-shuffled-hash guard: true (= broadcast
    * the frame) iff `n < limit`; the decision is recorded under
    * `site`. */
  def smallEnough(site: String, n: Long, limit: Long): Boolean = {
    val small = n < limit
    record(site, n, if (small) "broadcast" else "shuffle_hash")
    small
  }

  /** Remove and return everything recorded since the last drain. */
  def drain(): Seq[Decision] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Decision]
    var d = buf.poll()
    while (d != null) { out += d; d = buf.poll() }
    out.toSeq
  }

  def clear(): Unit = buf.clear()
}
