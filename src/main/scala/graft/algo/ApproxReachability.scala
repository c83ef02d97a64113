package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate descendant/ancestor counts via HyperLogLog-register
  * propagation — the corpus-scale path for SURVEY.md §2.8 G2 (exact
  * transitive closure is Θ(V·reach) pairs; sketch propagation is
  * O(V·sketchBytes) state and one shuffle per superstep, converging in
  * O(diameter) steps).
  *
  * Built entirely on Spark's datasketches expressions (`hll_sketch_agg`,
  * `hll_union` / `hll_union_agg`, `hll_sketch_estimate`) — no custom
  * aggregate needed (SURVEY §4.2 anticipated a TypedImperativeAggregate;
  * the built-ins cover it). Union is monotone → fixpoint is safe; at small
  * cardinalities HLL++ sparse mode is exact, so tests compare equal to the
  * exact closure ([[Reachability]]), the estimate-error regime only
  * appearing at true scale.
  */
object ApproxReachability {

  /** (id, descendants_approx) for every vertex: how many distinct vertices
    * are reachable (self excluded). `lgK` trades 1.5KB-per-vertex state for
    * ~1.6%/sqrt(2^lgK) relative error at scale. */
  def descendantCounts(edges: DataFrame, numPartitions: Int = 32,
                       maxIter: Int = 64, lgK: Int = 12): DataFrame = {
    val spark = edges.sparkSession
    val P = numPartitions
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst"))
      .dropDuplicates("src", "dst")
      .repartition(P, col("dst"))
      .persist()

    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()

    val init = verts.groupBy(col("id"))
      .agg(expr(s"hll_sketch_agg(id, $lgK)").as("sk"))
      .withColumn("est", expr("hll_sketch_estimate(sk)"))
      .withColumn("changed", lit(1L))
      .repartition(P, col("id"))

    val cfg = Superstep.Config(P, maxIter, tol = 0.0)
    // finally: an abort inside the loop must still drop the cached edges
    val res = try Superstep.run(spark, init, cfg) { (state, _) =>
      // pull: each vertex unions its successors' sketches
      val fromSucc = e
        .join(state.select(col("id"), col("sk").as("ssk")),
          e("dst") === col("id"))
        .groupBy(col("src"))
        .agg(expr("hll_union_agg(ssk)").as("merged"))
      state.select(col("id"), col("sk").as("old_sk"))
        .join(fromSucc, col("id") === fromSucc("src"), "left")
        .select(col("id"),
          when(col("merged").isNotNull, expr("hll_union(old_sk, merged)"))
            .otherwise(col("old_sk")).as("sk"),
          col("old_sk"))
        .withColumn("est", expr("hll_sketch_estimate(sk)"))
        // convergence gates on the REGISTER BYTES, not the estimate: in the
        // dense regime registers can grow without moving the rounded
        // estimate for a round, and halting then would drop propagation
        // that raises downstream estimates later. Register unions are
        // monotone and serialization deterministic, so byte-equality is a
        // true fixpoint test (at most one extra superstep vs est-gating)
        .withColumn("changed",
          when(col("sk") <=> col("old_sk"), 0L).otherwise(1L))
        .drop("old_sk")
    } { state =>
      state.agg(coalesce(sum(col("changed")), lit(0L))).collect()(0)
        .getLong(0).toDouble
    } finally e.unpersist(false)

    // own id is inside the sketch → estimate − 1 ≈ descendants
    res.state.select(col("id"),
      (col("est") - 1).cast("long").as("descendants_approx"))
  }
}
