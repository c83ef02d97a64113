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

    var known = starts.select(col("id").as("s"), col("id").as("v"))
      .repartition(P, col("v")).persist()
    var frontier = known
    known.count()
    var iter = 0
    var frontierSize = 1L
    while (frontierSize > 0 && iter < maxIter) {
      val next = frontier
        .join(e, frontier("v") === e("src"))
        .select(col("s"), col("dst").as("v"))
        .distinct()
        .join(known, Seq("s", "v"), "left_anti")
        .repartition(P, col("v"))
        .persist()
      frontierSize = next.count()
      if (frontierSize > 0) {
        val k2 = known.union(next).localCheckpoint(true)
        known.unpersist(false)
        known = k2
      }
      frontier.unpersist(false)
      frontier = next
      iter += 1
    }
    frontier.unpersist(false)
    if (reflexive) known
    else known.where(col("s") =!= col("v"))
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
