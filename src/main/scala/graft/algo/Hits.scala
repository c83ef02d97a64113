package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs & authorities (Kleinberg 1999) — the classic link-graph
  * companion to PageRank (reference has no HITS; this extends the
  * north-rule algorithm family with the other canonical link-analysis
  * ranking).
  *
  * Synchronous power iteration with per-step L1 normalization:
  *
  *   aₜ(v) = Σ_{(u,v)∈E} hₜ₋₁(u),  then aₜ /= Σ aₜ
  *   hₜ(v) = Σ_{(v,w)∈E} aₜ(w),    then hₜ /= Σ hₜ
  *
  * h₀ ≡ 1 (the first normalization makes the init scale irrelevant).
  * Vertices with no in-edges get authority 0; no out-edges, hub 0.
  *
  * Execution shape: the normalizing sums stay IN PLAN (single-row aggregate
  * cross-joined back — no driver collect inside the loop); each half-step
  * materializes via eager localCheckpoint, because the raw-score subplan is
  * consumed twice (sum + divide) — against a checkpoint leaf that is a flat
  * 2× per step, while against a lazy chain it would compound (the pinned
  * "materializeEvery" negative result, PLANS.md). Superseded states are
  * released deterministically.
  *
  * Determinism: double sums depend on reduce order; per-step relative noise
  * is ~1e-16 and compounds to ≲1e-14 over 20 steps — callers that compare
  * across engines round to 8dp (same policy as PageRank's g6 oracle).
  */
object Hits {

  /** @param edges DataFrame(src: long, dst: long); self-loops and duplicate
    *              edges dropped (simple-digraph semantics).
    * @return DataFrame(id: long, hub: double, auth: double) */
  def run(edges: DataFrame, iters: Int = 20,
          numPartitions: Int = 32): DataFrame = {
    require(iters >= 1, s"Hits: iters must be >= 1, got $iters")
    val P = numPartitions
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst"))
      .dropDuplicates("src", "dst")
      .repartition(P, col("src"))
      .persist()

    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .repartition(P, col("id"))
      .localCheckpoint(true)

    var hub = verts.select(col("id"), lit(1.0).as("h"))
      .localCheckpoint(true)
    var auth: DataFrame = null
    var completed = false
    try {
      for (_ <- 1 to iters) {
        val aRaw = e.join(hub.select(col("id"), col("h")),
          e("src") === col("id"))
          .groupBy(col("dst")).agg(sum(col("h")).as("s"))
        val aNorm = aRaw.agg(sum(col("s")).as("t"))
        val aNext = verts
          .join(aRaw, verts("id") === aRaw("dst"), "left")
          .crossJoin(aNorm)
          .select(verts("id"),
            (coalesce(col("s"), lit(0.0)) /
              when(col("t") > 0.0, col("t")).otherwise(lit(1.0))).as("a"))
          .repartition(P, col("id"))
          .localCheckpoint(true)
        if (auth != null) graft.core.Checkpoints.release(auth)
        auth = aNext

        val hRaw = e.join(auth.select(col("id"), col("a")),
          e("dst") === col("id"))
          .groupBy(col("src")).agg(sum(col("a")).as("s"))
        val hNorm = hRaw.agg(sum(col("s")).as("t"))
        val hNext = verts
          .join(hRaw, verts("id") === hRaw("src"), "left")
          .crossJoin(hNorm)
          .select(verts("id"),
            (coalesce(col("s"), lit(0.0)) /
              when(col("t") > 0.0, col("t")).otherwise(lit(1.0))).as("h"))
          .repartition(P, col("id"))
          .localCheckpoint(true)
        graft.core.Checkpoints.release(hub)
        hub = hNext
      }
      val out = hub.join(auth, Seq("id"))
        .select(col("id"), col("h").as("hub"), col("a").as("auth"))
        .localCheckpoint(true)
      graft.core.Checkpoints.release(hub)
      graft.core.Checkpoints.release(auth)
      graft.core.Checkpoints.release(verts)
      completed = true
      out
    } finally {
      e.unpersist(false)
      if (!completed) { // abort path: drop the loop state NOW, not at GC time
        graft.core.Checkpoints.release(hub)
        if (auth != null) graft.core.Checkpoints.release(auth)
        graft.core.Checkpoints.release(verts)
      }
    }
  }
}
