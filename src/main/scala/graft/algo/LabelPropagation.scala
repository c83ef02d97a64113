package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label propagation (community detection; north-rule operator,
  * repo:BASELINE.json). Deterministic variant — classic LPA breaks ties
  * randomly, which can never satisfy "labels exact" across runs, so ties are
  * broken by SMALLEST label (stable across runs and parallelism levels):
  *
  *   label'(v) = argmax_l |{u ∈ N_sym(v): label(u)=l}|, ties → min l;
  *               vertices with no neighbors keep their label.
  *
  * Superstep = edges⋈labels (co-partitioned) → groupBy(dst,label) count
  * (shuffle 1) → per-dst argmax via max(struct(cnt, -label)) (shuffle 2,
  * algebraic max so map-side partial aggregation bounds hub skew exactly as
  * in PageRank). Synchronous LPA can oscillate on bipartite structures, so
  * `maxIter` is a hard cap (default 10) in addition to the no-change test.
  */
object LabelPropagation {

  /** @param edges DataFrame(src: long, dst: long) — treated as undirected.
    * @return DataFrame(id: long, label: long). */
  def run(edges: DataFrame, numPartitions: Int = 32, maxIter: Int = 10,
          cfg0: Option[Superstep.Config] = None): Superstep.Result = {
    val spark = edges.sparkSession
    val P = numPartitions

    val sym = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .union(edges.select(col("dst").cast("long").as("src"),
                          col("src").cast("long").as("dst")))
      .where(col("src") =!= col("dst"))
      .dropDuplicates("src", "dst")
      .repartition(P, col("src"))
      .persist()

    val init = sym.select(col("src").as("id")).distinct()
      .repartition(P, col("id"))
      .select(col("id"), col("id").as("label"), lit(1L).as("changed"))

    val cfg = cfg0.getOrElse(Superstep.Config(P, maxIter, tol = 0.0))

    // finally: an abort inside the loop must still drop the cached edges
    val res = try Superstep.run(spark, init, cfg) { (state, _) =>
      val votes = sym
        .join(state.select(col("id"), col("label").as("nlabel")),
              sym("src") === col("id"))
        .groupBy(col("dst"), col("nlabel"))
        .agg(count("*").as("cnt"))
      // argmax by (cnt desc, label asc): max over struct(cnt, -label)
      val winner = votes
        .groupBy(col("dst"))
        .agg(max(struct(col("cnt"), (-col("nlabel")).as("neg"))).as("w"))
        .select(col("dst"), (-col("w.neg")).as("newLabel"))
      state.select(col("id"), col("label").as("old"))
        .join(winner, col("id") === winner("dst"), "left")
        .select(col("id"),
                coalesce(col("newLabel"), col("old")).as("label"),
                col("old"))
        .withColumn("changed", when(col("label") =!= col("old"), 1L).otherwise(0L))
        .drop("old")
    } { state =>
      state.agg(coalesce(sum(col("changed")), lit(0L))).collect()(0).getLong(0).toDouble
    } finally sym.unpersist(false)

    res.copy(state = res.state.select("id", "label"))
  }
}
