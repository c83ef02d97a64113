package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frontier BFS / shortest unweighted distances from a source set, as
  * DataFrame supersteps — the engine primitive behind the reference's
  * reachability-family features (ancestors/descendants counts G2, closeness
  * G3, eccentricity G5 — SURVEY.md §2.8; networkx does per-node BFS, we do
  * one distributed multi-source sweep).
  *
  * State(id, dist, changed); superstep relaxes dist over edges:
  *   dist'(v) = min(dist(v), min_{(u,v)∈E} dist(u)+1)
  * Converges in O(eccentricity) supersteps; each is the standard
  * co-partitioned edges⋈state join + one groupBy(dst) min shuffle.
  */
object Bfs {

  /** @param edges    DataFrame(src, dst); set `undirected` to symmetrize.
    * @param sources  DataFrame with column `id` — distance-0 seeds.
    * @return DataFrame(id: long, dist: long); unreachable vertices carry
    *         dist = -1 (the reference's disconnected sentinel, SURVEY §2.11.7). */
  def run(edges: DataFrame, sources: DataFrame, undirected: Boolean = false,
          numPartitions: Int = 32, maxIter: Int = 64,
          cfg0: Option[Superstep.Config] = None): Superstep.Result = {
    val spark = edges.sparkSession
    val P = numPartitions
    val INF = Long.MaxValue / 4

    val base = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val dir = if (undirected)
      base.union(base.select(col("dst").as("src"), col("src").as("dst")))
    else base
    val e = dir.where(col("src") =!= col("dst"))
      .dropDuplicates("src", "dst")
      .repartition(P, col("src"))
      .persist()

    val init = e.select(col("src").as("id")).union(e.select(col("dst").as("id")))
      .distinct()
      .repartition(P, col("id"))
      // distinct: duplicate seed rows would otherwise multiply state rows
      // through the left join and persist as duplicate (id, dist) output
      .join(sources.select(col("id")).distinct()
        .withColumn("s", lit(0L)), Seq("id"), "left")
      .select(col("id"),
              when(col("s").isNotNull, 0L).otherwise(lit(INF)).as("dist"),
              lit(1L).as("changed"))

    val cfg = cfg0.getOrElse(Superstep.Config(P, maxIter, tol = 0.0))

    // finally: an abort inside the loop must still drop the cached edges
    val res = try Superstep.run(spark, init, cfg) { (state, _) =>
      // relax only from the FRONTIER (changed last step): in synchronous
      // unit-weight BFS a settled vertex's offers were all made the round
      // after it changed, so re-relaxing the settled set every round is
      // O(E·diameter) work where O(E) total suffices
      val relax = e
        .join(state.where(col("changed") === 1L && col("dist") < INF)
                   .select(col("id"), (col("dist") + 1L).as("nd")),
              e("src") === col("id"))
        .groupBy(col("dst"))
        .agg(min(col("nd")).as("best"))
      state.select(col("id"), col("dist").as("old"))
        .join(relax, col("id") === relax("dst"), "left")
        .select(col("id"),
                least(col("old"), coalesce(col("best"), col("old"))).as("dist"),
                col("old"))
        .withColumn("changed", when(col("dist") =!= col("old"), 1L).otherwise(0L))
        .drop("old")
    } { state =>
      state.agg(coalesce(sum(col("changed")), lit(0L))).collect()(0).getLong(0).toDouble
    } finally e.unpersist(false)

    res.copy(state = res.state.select(
      col("id"), when(col("dist") >= INF, -1L).otherwise(col("dist")).as("dist")))
  }
}
