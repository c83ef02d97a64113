package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperBall (Boldi & Vigna, WebAlgorithmics 2013 — public algorithm):
  * neighborhood-function sketches for closeness centrality and
  * eccentricity at 10^12-vertex scale. The last exact-only G-series
  * metrics (G3/G5) get their sketch tier here: exact all-pairs BFS is
  * Θ(V·reach) pairs; HyperBall is O(V · sketchBytes) state, one shuffle
  * per superstep, O(diameter) supersteps.
  *
  * Per superstep t, each vertex unions its IN-neighbors' HLL balls, so
  * after t steps the sketch estimates |{u : d(u,v) ≤ t}| — the nodes that
  * can REACH v, matching networkx's incoming-path closeness semantics
  * (GraphMetrics.structure). The per-step estimate increment is the count
  * of nodes at distance exactly t, giving:
  *   sum_d(v)  = Σ_t t · (N_t(v) − N_{t−1}(v))   (Σ of incoming distances)
  *   harm(v)   = Σ_t (N_t(v) − N_{t−1}(v)) / t   (harmonic centrality —
  *               the metric HyperBall was introduced for; networkx
  *               harmonic_centrality semantics: Σ 1/d(u,v) over u≠v)
  *   ecc(v)    = last t where the ball grew       (incoming eccentricity)
  *   closeness = WF-scaled ((r−1)/Σd)·((r−1)/(n−1)), r = final estimate.
  *
  * Built on Spark's datasketches expressions like [[ApproxReachability]];
  * at small cardinalities HLL++ sparse mode is exact, so the spec pins
  * equality with the exact GraphMetrics core on micro graphs — the
  * estimate-error regime (~1.6%/√2^lgK) only appears at true scale.
  * Pass the symmetrized edge set for undirected (nx-eccentricity)
  * semantics.
  */
object HyperBall {

  /** (id, reach_approx, sum_dist_approx, ecc_approx, closeness_approx).
    * `cfg0` threads a checkpointing Superstep config (store + cadence) for
    * mid-convergence resume, same as the other iterative algorithms. */
  def run(edges: DataFrame, numPartitions: Int = 32, maxIter: Int = 64,
          lgK: Int = 12, cfg0: Option[Superstep.Config] = None): DataFrame = {
    val spark = edges.sparkSession
    val P = numPartitions
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst"))
      .dropDuplicates("src", "dst")
      .repartition(P, col("src"))
      .persist()

    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val n = verts.count()

    val init = verts.groupBy(col("id"))
      .agg(expr(s"hll_sketch_agg(id, $lgK)").as("sk"))
      .withColumn("est", expr("hll_sketch_estimate(sk)"))
      .withColumn("sumd", lit(0.0))
      .withColumn("harm", lit(0.0))
      .withColumn("ecc", lit(0L))
      .withColumn("changed", lit(1L))
      .repartition(P, col("id"))

    val cfg = cfg0.getOrElse(Superstep.Config(P, maxIter, tol = 0.0))
    // finally: an abort inside the loop must still drop the cached edges
    val res = try Superstep.run(spark, init, cfg) { (state, step) =>
      val t = step + 1 // distance reached by this superstep's expansion
      // each vertex unions its predecessors' balls (incoming direction)
      val fromPred = e
        .join(state.select(col("id"), col("sk").as("psk")),
          e("src") === col("id"))
        .groupBy(col("dst"))
        .agg(expr("hll_union_agg(psk)").as("merged"))
      state.select(col("id"), col("sk").as("old_sk"), col("est").as("old_est"),
          col("sumd"), col("harm"), col("ecc"))
        .join(fromPred, col("id") === fromPred("dst"), "left")
        .select(col("id"),
          when(col("merged").isNotNull, expr("hll_union(old_sk, merged)"))
            .otherwise(col("old_sk")).as("sk"),
          col("old_sk"), col("old_est"), col("sumd"), col("harm"), col("ecc"))
        .withColumn("est", expr("hll_sketch_estimate(sk)"))
        .withColumn("grew", col("est") > col("old_est"))
        .withColumn("sumd",
          col("sumd") + when(col("grew"),
            (col("est") - col("old_est")) * t).otherwise(0.0))
        .withColumn("harm",
          col("harm") + when(col("grew"),
            (col("est") - col("old_est")) / t).otherwise(0.0))
        .withColumn("ecc", when(col("grew"), lit(t.toLong)).otherwise(col("ecc")))
        // loop continuation gates on REGISTER BYTES (monotone unions,
        // deterministic serialization → true fixpoint), not the estimate:
        // dense-regime register growth with a flat rounded estimate must
        // keep propagating. grew/sumd/ecc stay estimate-based — they track
        // the neighborhood-function increments, which ARE the estimates
        .withColumn("changed",
          when(col("sk") <=> col("old_sk"), 0L).otherwise(1L))
        .drop("old_sk", "old_est", "grew")
    } { state =>
      state.agg(coalesce(sum(col("changed")), lit(0L))).collect()(0)
        .getLong(0).toDouble
    } finally e.unpersist(false)

    res.state.select(col("id"),
      (col("est") - 1).cast("long").as("reach_approx"),
      col("sumd").as("sum_dist_approx"),
      col("harm").as("harmonic_approx"),
      col("ecc").as("ecc_approx"),
      when(col("sumd") > 0 && lit(n) > 1,
        ((col("est") - 1) / col("sumd")) * ((col("est") - 1) / (n - 1).toDouble))
        .otherwise(0.0).as("closeness_approx"))
  }
}
