package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Directed reachability (transitive closure) — the engine primitive behind
  * the reference's ancestors/descendants counts
  * (/root/reference/code/features/structure.py:129-131, SURVEY.md §2.8 G2).
  *
  * Semi-naïve evaluation: the state is the closure pair-set plus the current
  * frontier; each superstep extends only the FRONTIER by one hop and
  * anti-joins out already-known pairs, so work per step is proportional to
  * new facts, not the whole closure (the standard datalog TC evaluation).
  *
  * Scale note: exact closure is Θ(V·reach) pairs — only viable on bounded
  * components (per-site graphs, as in the reference). The corpus-scale
  * variant for COUNTS is HLL-register propagation (SURVEY.md §4.2); this
  * operator is the exact small/medium path and the oracle for that one.
  */
object Reachability {

  /** Closure pairs (s, v): v reachable from s in ≥1 step... including s
    * itself iff `reflexive`. Input edges(src, dst).
    * @param sources optional DataFrame(id) restricting start vertices. */
  def closure(edges: DataFrame, sources: Option[DataFrame] = None,
              reflexive: Boolean = true, numPartitions: Int = 32,
              maxIter: Int = 64): DataFrame = {
    val P = numPartitions
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst"))
      .dropDuplicates("src", "dst")
      .repartition(P, col("src"))
      .persist()

    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val starts = sources.map(s => s.select(col("id").cast("long")))
      .getOrElse(verts)

    val seedPairs = starts.select(col("id").as("s"), col("id").as("v"))
      .repartition(P, col("v"))
    // reflexive=false: seeds are NOT pre-known, so a (s,s) pair derived
    // through a genuine cycle survives the anti-join and appears in the
    // output — "reachable in ≥1 step" includes self-reachability via cycles
    //
    // Loop-carried state is an EAGER localCheckpoint (leaf plan, physical
    // partitioning preserved), never a bare persist: a persisted frontier's
    // logical plan chains through every previous superstep, holding O(d²)
    // live plan nodes and paying quadratic re-analysis over a deep closure
    // (same pathology GraphMetrics.distances hit at large diameter).
    // reflexive=true: frontier ALIASES known (identical seed data) — the
    // `frontier ne known` release guards exist for exactly this, and a
    // second eager checkpoint of the same O(V) seed set would be a
    // redundant materialization + storage copy
    var known = (if (reflexive) seedPairs else seedPairs.limit(0))
      .localCheckpoint(true)
    var frontier = if (reflexive) known else seedPairs.localCheckpoint(true)
    var frontierSize = 1L
    var completed = false
    try {
      var iter = 0
      while (frontierSize > 0 && iter < maxIter) {
        val next = frontier
          .join(e, frontier("v") === e("src"))
          .select(col("s"), col("dst").as("v"))
          .distinct()
          .join(known, Seq("s", "v"), "left_anti")
          .repartition(P, col("v"))
          .localCheckpoint(true)
        frontierSize = next.count()
        // superseded checkpoints are released NOW (Dataset.unpersist is a
        // no-op on them — graft.core.Checkpoints doc): `next` is eager, so
        // nothing reads the old frontier/known again. Deterministic release
        // beats waiting for driver GC + ContextCleaner — over a deep closure
        // the stragglers are O(diameter) full state copies.
        if (frontier ne known) graft.core.Checkpoints.release(frontier)
        if (frontierSize > 0) {
          val grown = known.union(next).localCheckpoint(true)
          graft.core.Checkpoints.release(known)
          known = grown
        }
        frontier = next
        iter += 1
      }
      if (frontierSize > 0)
        // loud failure beats a silently-truncated closure: the DuckDB
        // recursive-CTE oracle has no depth cap, and downstream counts would
        // be wrong with no signal
        throw new IllegalStateException(
          s"transitive closure did not converge in $maxIter supersteps " +
            s"(frontier still $frontierSize pairs) — raise maxIter")
      completed = true
      // reflexive=false: known holds only DERIVED pairs (seeds were never
      // added), so cycle self-reachability (s,s) is already exactly right
      known
    } finally {
      e.unpersist(false)
      // the last frontier (the final empty `next` checkpoint on success) is
      // never read again on ANY path — release it unconditionally, like
      // GraphMetrics.distances does; only `known` is returned to the caller
      if (frontier ne known) graft.core.Checkpoints.release(frontier)
      // abort path (count() failure, the non-convergence throw): nothing
      // downstream can read `known` again either — release it now instead
      // of pinning O(closure) blocks until driver GC
      if (!completed) graft.core.Checkpoints.release(known)
    }
  }

  /** Per-start reachable-set size (descendants count; s itself excluded). */
  def descendantCounts(edges: DataFrame, numPartitions: Int = 32): DataFrame =
    closure(edges, None, reflexive = true, numPartitions)
      .groupBy(col("s").as("id"))
      .agg((count(lit(1)) - 1).as("descendants"))

  /** Per-target count of vertices that can reach it (ancestors). */
  def ancestorCounts(edges: DataFrame, numPartitions: Int = 32): DataFrame =
    closure(edges, None, reflexive = true, numPartitions)
      .groupBy(col("v").as("id"))
      .agg((count(lit(1)) - 1).as("ancestors"))
}
