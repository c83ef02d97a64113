package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic storage release for materialized frames.
  *
  * `Dataset.unpersist` only talks to the CacheManager, so it is a SILENT
  * NO-OP for a `localCheckpoint(true)` frame: the checkpoint persists the
  * underlying internal RDD directly (MEMORY_AND_DISK) and never registers
  * with the cache manager. Every superstep loop that "unpersists" its
  * superseded state through the Dataset API therefore pins one state copy
  * per iteration until the driver GC + ContextCleaner happen to reclaim the
  * unreachable RDD — nondeterministic timing that turns into real block-
  * manager pressure on a long convergence run (100 supersteps × state size
  * at 10^12-edge scale). This helper releases the blocks NOW:
  *
  *  - a checkpointed frame analyzes to a bare [[LogicalRDD]] leaf — unpersist
  *    the wrapped RDD itself;
  *  - anything else falls through to `Dataset.unpersist` (correct for
  *    `.persist()`/`.cache()` frames, harmless no-op otherwise).
  *
  * Only release a checkpoint that nothing will read again: its lineage is
  * truncated, so a dropped block cannot be recomputed (a later read fails
  * with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND rather than going slow).
  */
object Checkpoints {

  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
    case _              => df.unpersist(blocking = false)
  }

  /** Release every checkpoint leaf a DERIVED frame still pins — the
    * consume-then-drop call for results like `Superstep.Result.state`,
    * which project over the final loop checkpoint (so [[release]]'s
    * exact-leaf match would fall through to the no-op Dataset.unpersist).
    * Only call once the frame is fully consumed; the leaves are shared by
    * every other frame derived from the same checkpoint. */
  def releaseLeaves(df: DataFrame): Unit = {
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _              => ()
    }
    df.unpersist(blocking = false) // plus the cache-manager entry, if any
  }
}
