package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Betweenness centrality (Brandes, "A faster algorithm for betweenness
  * centrality", 2001) on the directed graph, distributed as level-
  * synchronous supersteps: bc(v) = Σ over source/target pairs (s,t) of the
  * fraction of shortest s→t paths passing through v (endpoints excluded,
  * unnormalized). Extends the north-rule family — the classic web-graph
  * importance metric one tier past PageRank (path-load, not random-surfer).
  *
  * Two phases, each one frontier-shaped join per level:
  *  - FORWARD: multi-source BFS carrying σ (shortest-path counts, exact
  *    BIGINT sums): level d+1 = frontier ⋈ edges, per-(source, vertex)
  *    σ-sum, anti-join against visited pairs (the Reachability shape).
  *  - BACKWARD: Brandes dependency accumulation from the deepest level up:
  *    δ(s,v) = Σ over successors w of (σ_sv/σ_sw)·(1 + δ_sw); bc(v) =
  *    Σ_s δ(s,v) over non-source rows.
  *
  * Exact betweenness is inherently all-(source)-pairs work; the corpus-
  * scale path is SOURCE SAMPLING (`sources` — Brandes–Pich pivots, the
  * standard estimator: bc restricted to sampled sources is this same job,
  * and the g18 oracle runs it from an id%3 pivot set). Every level is an
  * eager localCheckpoint leaf (the distances/closure plan-lineage rule) and
  * every superseded checkpoint is released deterministically; only the
  * final bc table survives the call.
  *
  * Float policy: σ stays integer end-to-end; only the backward division is
  * floating. Brandes' recursion is algebraically identical to the direct
  * Σ σ_sv·σ_vt/σ_st formula but associates differently, so oracles compare
  * at 6dp — bc magnitudes reach ~10⁴ here, and 6dp keeps the rounding-edge
  * flip probability ~10⁻³ where 8dp would be ~10⁻¹ (QueriesGraph g18 doc).
  */
object Betweenness {

  /** @param edges   DataFrame(src: long, dst: long), directed, dedup'd
    *                internally; self-loops dropped.
    * @param sources optional DataFrame(id) — restrict to these BFS sources
    *                (sampled-pivot estimator); None = exact (all vertices).
    * @return DataFrame(id: long, bc: double) over ALL vertices (0.0 for
    *         never-intermediate ones). */
  def run(edges: DataFrame, sources: Option[DataFrame] = None,
          numPartitions: Int = 32, maxDepth: Int = 256): DataFrame = {
    val P = numPartitions
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst"))
      .dropDuplicates("src", "dst")
      .repartition(P, col("src"))
      .persist()

    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val starts = sources.map(_.select(col("id").cast("long")))
      .getOrElse(verts)

    // levels(d): (s, v, sigma) — σ = number of shortest s→v paths, d = |path|
    val levels = ArrayBuffer[DataFrame]()
    val deltas = ArrayBuffer[DataFrame]()
    var visited: DataFrame = null
    var result: DataFrame = null
    try {
      var frontier = starts
        .select(col("id").as("s"), col("id").as("v"), lit(1L).as("sigma"))
        .repartition(P, col("v"))
        .localCheckpoint(true)
      levels += frontier
      visited = frontier.select("s", "v").localCheckpoint(true)
      var n = frontier.count()
      var depth = 0
      while (n > 0 && depth < maxDepth) {
        val next = frontier
          .join(e, frontier("v") === e("src"))
          .select(col("s"), col("dst").as("nv"), col("sigma"))
          .groupBy(col("s"), col("nv").as("v"))
          .agg(sum(col("sigma")).as("sigma"))
          .join(visited, Seq("s", "v"), "left_anti")
          .repartition(P, col("v"))
          .localCheckpoint(true)
        n = next.count()
        if (n > 0) {
          levels += next
          val grown = visited.union(next.select("s", "v")).localCheckpoint(true)
          graft.core.Checkpoints.release(visited)
          visited = grown
          depth += 1
        } else graft.core.Checkpoints.release(next)
        frontier = next
      }
      if (n > 0)
        throw new IllegalStateException(
          s"betweenness forward phase did not settle in $maxDepth levels — raise maxDepth")

      // backward: δ at the deepest level is 0 (no successors) — a lazy
      // projection over the already-checkpointed level, no extra copy.
      // Level 0 is the sources themselves (δ never added to bc, Brandes),
      // so the walk stops at d=1 and no d=0 δ table is ever built. Every
      // computed δ table is KEPT (it feeds both the next level's recursion
      // and the final bc union) and released only in the finally, after
      // `result` has materialized.
      var delta = levels.last
        .select(col("s"), col("v"), col("sigma"), lit(0.0).as("delta"))
      for (d <- (levels.size - 2) to 1 by -1) {
        val up = delta.select(col("s").as("us"), col("v").as("uv"),
          col("sigma").as("usigma"), col("delta").as("udelta"))
        val lvl = levels(d)
        val contrib = lvl
          .join(e, lvl("v") === e("src"))
          .join(up, col("s") === col("us") && col("dst") === col("uv"))
          .select(col("s"), col("v"),
            (col("sigma").cast("double") / col("usigma").cast("double") *
              (lit(1.0) + col("udelta"))).as("c"))
          .groupBy("s", "v").agg(sum(col("c")).as("delta"))
        val nextDelta = lvl
          .join(contrib, Seq("s", "v"), "left")
          .select(col("s"), col("v"), col("sigma"),
            coalesce(col("delta"), lit(0.0)).as("delta"))
          .repartition(P, col("v"))
          .localCheckpoint(true)
        deltas += nextDelta
        delta = nextDelta
      }

      val bc = deltas.toSeq
        .map(_.select(col("v"), col("delta")))
        .reduceOption(_.union(_))
        .map(_.groupBy(col("v").as("id")).agg(sum(col("delta")).as("bc")))
      val full = bc match {
        case Some(b) => verts.join(b, Seq("id"), "left")
          .select(col("id"), coalesce(col("bc"), lit(0.0)).as("bc"))
        case None => verts.select(col("id"), lit(0.0).as("bc"))
      }
      result = full.localCheckpoint(true)
      result
    } finally {
      e.unpersist(false)
      if (visited != null) graft.core.Checkpoints.release(visited)
      // levels and the per-level δ tables fed the bc aggregate, which
      // `result` has already materialized (or the call aborted and nothing
      // can read them) — release them all; only `result` survives
      levels.foreach(graft.core.Checkpoints.release)
      deltas.foreach(graft.core.Checkpoints.release)
    }
  }

  /** Brandes–Pich pivot ESTIMATOR of full betweenness ("Centrality
    * estimation in large networks", 2007): with k pivots sampled from the
    * n vertices, b̂(v) = (n/k) · Σ_{s ∈ pivots} δ_s(v) — an unbiased
    * estimator of bc(v) whose per-vertex error obeys the Hoeffding bound
    *
    *   P( |b̂(v) − bc(v)| ≥ ξ·n·(n−2) ) ≤ 2·exp(−2·k·ξ²)
    *
    * since each per-source dependency δ_s(v) lies in [0, n−2]. Inverting at
    * a union-bounded failure budget δ over all n vertices gives the
    * deterministic acceptance bound ξ = sqrt(ln(2n/δ) / (2k)) that
    * AlgoSpec checks observed error against on a golden graph (measured
    * bound-vs-observed numbers in BASELINE.md §betweenness-sampling).
    * [[run]] with `sources` is the RESTRICTED sum (what the g18 oracle
    * mirrors exactly); this wraps it with the n/k extrapolation — both
    * scalars stay in-plan (single-row aggregates, broadcast like every
    * scalar in GraphStats). */
  def estimate(edges: DataFrame, pivots: DataFrame, numPartitions: Int = 32,
               maxDepth: Int = 256): DataFrame = {
    val restricted = run(edges, Some(pivots), numPartitions, maxDepth)
    // run() returns every vertex (0.0 for never-intermediate), so |V| is
    // its own row count; k dedups the caller's pivot list defensively
    val nAgg = restricted.agg(count(lit(1)).cast("double").as("n"))
    val kAgg = pivots.select(col("id")).distinct()
      .agg(count(lit(1)).cast("double").as("k"))
    restricted.crossJoin(broadcast(nAgg)).crossJoin(broadcast(kAgg))
      .select(col("id"), (col("bc") * col("n") / col("k")).as("bc_est"))
  }
}
