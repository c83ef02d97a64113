package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic graph random walks — DeepWalk-style corpus generation
  * (Perozzi et al., "DeepWalk: online learning of social representations",
  * KDD 2014): from every seed vertex, walk `length` steps along out-edges,
  * choosing the next hop by a *hash draw* over the frontier's neighbors.
  * The walk table (walker, step, node) is the positive-sample corpus a
  * graph-embedding trainer consumes; on a 10^12-page link graph it is the
  * canonical pre-training extraction job.
  *
  * Determinism: the "random" draw is argmin over out-neighbors of a
  * 32-bit md5-derived key of (walker, step, candidate) — replay-stable
  * under any retry/partition order (no RNG state, the engine's F19 rule), and
  * engine-portable: `conv(substring(md5(s),1,8),16,10)` here is bit-equal
  * to DuckDB's `('0x' || substring(md5(s),1,8))::BIGINT`, which is what
  * lets the g17 oracle replay the exact walks (the d4/e2/e3 recipe). Ties
  * (a 1-in-2³² hash collision among one vertex's neighbors) break by dst.
  *
  * Shape: `length` supersteps, each ONE join of the current frontier
  * (|seeds| rows) against the edge table on the walk position followed by a
  * per-walker min — the frontier never grows, dead-end walks simply stop
  * (no rows at later steps). State is the accumulated path table, a
  * materialized leaf per step (Superstep), so step k's plan is flat. Walks
  * are embarrassingly parallel across walkers; the only shuffle per step is
  * the frontier⋈edges hash join plus the walker-keyed argmin aggregate.
  */
object RandomWalks {

  private def drawKey(walker: org.apache.spark.sql.Column,
                      step: org.apache.spark.sql.Column,
                      dst: org.apache.spark.sql.Column) =
    conv(substring(md5(concat_ws("_", walker, step, dst)), 1, 8), 16, 10)
      .cast("long")

  /** @param edges  DataFrame(src: long, dst: long), directed.
    * @param seeds  DataFrame(id: long) — one walker starts per seed.
    * @param length number of steps (walk has ≤ length+1 positions).
    * @return DataFrame(walker: long, step: int, node: long). */
  def run(edges: DataFrame, seeds: DataFrame, length: Int,
          numPartitions: Int = 32): DataFrame = {
    val spark = edges.sparkSession
    val P = numPartitions
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(P, col("src"))

    val init = seeds
      .select(col("id").cast("long").as("walker"), lit(0).as("step"),
        col("id").cast("long").as("node"))
      .repartition(P, col("walker"))
      .withColumn("changed", lit(1L))

    // fixedStep: exactly `length` rounds, no convergence job — a dead-end
    // frontier contributes no rows and later rounds are cheap no-ops
    val cfg = Superstep.Config(P, length, tol = 0.0, fixedStep = true)
    val res = Superstep.run(spark, init, cfg) { (state, k) =>
      val frontier = state.where(col("step") === k)
        .select(col("walker"), col("node"))
      val cand = frontier.join(e, frontier("node") === e("src"))
        .select(col("walker"),
          drawKey(col("walker"), lit(k + 1), col("dst")).as("h"),
          col("dst"))
      // argmin over (h, dst): min of the packed struct is the same
      // lexicographic draw the oracle's ROW_NUMBER window takes
      val nxt = cand.groupBy("walker")
        .agg(min(struct(col("h"), col("dst"))).as("pick"))
        .select(col("walker"), lit(k + 1).as("step"),
          col("pick.dst").as("node"))
      state.select("walker", "step", "node")
        .union(nxt)
        .withColumn("changed", lit(1L))
    } { _ => Double.MaxValue }

    res.state.select("walker", "step", "node")
  }
}
