package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

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
  * under any retry/partition order (no RNG state, the engine's F19 rule),
  * and engine-portable: `conv(substring(md5(s),1,8),16,10)` here is
  * bit-equal to DuckDB's `('0x' || substring(md5(s),1,8))::BIGINT`, which
  * is what lets the g17 oracle replay the exact walks (the d4/e2/e3
  * recipe). Ties (a 1-in-2³² hash collision among one vertex's neighbors)
  * break by dst.
  *
  * Shape: `length` rounds, each ONE join of the current frontier (≤ one
  * row per live walker — the frontier NEVER grows) against the edge table
  * on the walk position, followed by a per-walker argmin (min of the
  * packed (h, dst) struct ≡ the oracle's ROW_NUMBER draw). Dead-end walks
  * simply stop (no rows at later steps). Each round's frontier is an eager
  * localCheckpoint LEAF kept in a buffer; the result is ONE union of the
  * per-step leaves materialized at the end — accumulating the path inside
  * the loop state would re-write the whole O(steps·walkers) table every
  * round (O(length²·walkers) churn) for no benefit. All intermediate
  * leaves are released once the result materializes.
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
    val P = numPartitions
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .repartition(P, col("src"))
      .persist()

    val steps = ArrayBuffer[DataFrame]()
    var result: DataFrame = null
    try {
      var frontier = seeds
        .select(col("id").cast("long").as("walker"), lit(0).as("step"),
          col("id").cast("long").as("node"))
        .dropDuplicates("walker") // one walker per distinct seed
        .repartition(P, col("node"))
        .localCheckpoint(true)
      steps += frontier
      var k = 0
      var live = frontier.count()
      while (live > 0 && k < length) {
        val cand = frontier.join(e, frontier("node") === e("src"))
          .select(col("walker"),
            drawKey(col("walker"), lit(k + 1), col("dst")).as("h"),
            col("dst"))
        val nxt = cand.groupBy("walker")
          .agg(min(struct(col("h"), col("dst"))).as("pick"))
          .select(col("walker"), lit(k + 1).as("step"),
            col("pick.dst").as("node"))
          .repartition(P, col("node"))
          .localCheckpoint(true)
        live = nxt.count()
        if (live > 0) steps += nxt
        else graft.core.Checkpoints.release(nxt)
        frontier = nxt
        k += 1
      }
      result = steps.toSeq.map(_.select("walker", "step", "node"))
        .reduce(_.union(_))
        .localCheckpoint(true)
      result
    } finally {
      e.unpersist(false)
      steps.foreach(graft.core.Checkpoints.release)
    }
  }
}
