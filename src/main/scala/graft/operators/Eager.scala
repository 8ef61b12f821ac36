package graft.operators

import org.apache.spark.sql.DataFrame

/** Eager terminal materialization for cache-releasing operators.
  *
  * Operators that persist a large intermediate (shingle digests, deduped
  * corpora) localCheckpoint their SMALL terminal result so the persisted
  * frame can be unpersisted before returning — otherwise the cache pins
  * storage memory for the caller's whole session (measured as multi-×
  * bench interference deep into a 150-query suite). localCheckpoint, not
  * persist: the materializing job still runs under AQE.
  *
  * `graft.eagerRelease=false` (session conf) disables the checkpoint so
  * plan-audit harnesses ([[graft.Explain]]) see the full logical plan
  * instead of an ExistingRDD scan; results are identical either way —
  * the unpersist then merely means lazy consumers recompute the
  * intermediate (deterministic plans, just uncached).
  */
private[graft] object Eager {
  def terminal(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.getOption("graft.eagerRelease")
        .forall(_.toBoolean)) df.localCheckpoint()
    else df
}
