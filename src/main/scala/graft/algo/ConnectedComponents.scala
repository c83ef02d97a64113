package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components (undirected semantics over the digraph, matching
  * networkx `connected_components` on `G.to_undirected()` — the reference's
  * eccentricity path symmetrizes the same way,
  * /root/reference/code/features/structure.py:173, SURVEY.md §2.8 G5).
  *
  * Algorithm: min-label propagation with POINTER JUMPING ("shortcutting").
  * Plain min-label needs O(diameter) supersteps — fatal on chain-shaped
  * components; adding comp ← comp(comp) per superstep (treating the current
  * label as a parent pointer) halves path lengths and converges in
  * O(log diameter), the same asymptotics as small-star/large-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
  * with a simpler two-join superstep:
  *
  *   hook:     m(v)    = min(comp(v), min_{(u,v)∈E_sym} comp(u))  (1 shuffle)
  *   shortcut: comp'(v)= min over the component-id's own current label
  *                       (join m's value against state on id — co-partitioned
  *                        only when labels are ids; needs 1 shuffle of the
  *                        small (label→label) projection)
  *
  * Convergence: no label changed (sum(changed) == 0).
  */
object ConnectedComponents {

  /** @param edges DataFrame(src: long, dst: long)
    * @return DataFrame(id: long, comp: long) — comp = min vertex id of the
    *         component (canonical, deterministic). */
  def run(edges: DataFrame, numPartitions: Int = 32, maxIter: Int = 50,
          cfg0: Option[Superstep.Config] = None): Superstep.Result = {
    val spark = edges.sparkSession
    val P = numPartitions

    // symmetrized, deduplicated neighbor table, partitioned by src
    val sym = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .union(edges.select(col("dst").cast("long").as("src"),
                          col("src").cast("long").as("dst")))
      .where(col("src") =!= col("dst"))
      .dropDuplicates("src", "dst")
      .repartition(P, col("src"))
      .persist()

    val init = sym.select(col("src").as("id")).distinct()
      .repartition(P, col("id"))
      .select(col("id"), col("id").as("comp"), lit(1L).as("changed"))

    val cfg = cfg0.getOrElse(Superstep.Config(P, maxIter, tol = 0.0))

    // finally: an abort inside the loop must still drop the cached edges
    val res = try Superstep.run(spark, init, cfg) { (state, _) =>
      // hook: min neighbor label
      val nbrMin = sym
        .join(state.select(col("id"), col("comp").as("ncomp")),
              sym("src") === col("id"))
        .groupBy(col("dst"))
        .agg(min(col("ncomp")).as("nmin"))
      val hooked = state.select(col("id"), col("comp"))
        .join(nbrMin, col("id") === nbrMin("dst"), "left")
        .select(col("id"), col("comp").as("old"),
                least(col("comp"), coalesce(col("nmin"), col("comp"))).as("m"))
      // shortcut: follow the label's own current label (pointer jump)
      val labels = state.select(col("id").as("lid"), col("comp").as("lcomp"))
      hooked
        .join(labels, hooked("m") === col("lid"), "left")
        .select(
          col("id"),
          least(col("m"), coalesce(col("lcomp"), col("m"))).as("comp"),
          col("old"))
        .withColumn("changed", when(col("comp") =!= col("old"), 1L).otherwise(0L))
        .drop("old")
    } { state =>
      state.agg(coalesce(sum(col("changed")), lit(0L))).collect()(0).getLong(0).toDouble
    } finally sym.unpersist(false)

    res.copy(state = res.state.select("id", "comp"))
  }
}
