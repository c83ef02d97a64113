package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-core decomposition (coreness per vertex) of the undirected simple
  * graph — the standard link-graph density peel (a vertex's coreness is the
  * largest k such that it survives repeatedly deleting all vertices of
  * degree < k). Extends the north-rule algorithm family; the reference has
  * no density operator.
  *
  * Algorithm: iterated neighborhood h-index (Lü, Zhou, Zhang & Stanley,
  * "The H-index of a network node", Nature Communications 2016):
  *
  *   c₀(v) = deg(v);   cₜ₊₁(v) = H({cₜ(u) : u ∈ N(v)})
  *
  * where H is the h-index (the largest h such that at least h neighbor
  * values are ≥ h). The sequence is integer, monotonically non-increasing,
  * and converges exactly to coreness. Unlike the classic sequential peel,
  * every step is a pure per-vertex aggregate over the UNCHANGED edge table
  * — the superstep shape this engine already pins for PageRank/CC (no
  * shrinking-graph bookkeeping, no global ordering).
  *
  * H has two algebraically identical forms (CorenessSpec pins ≡ on random
  * graphs; integers throughout, so ANY engine computing either formula
  * agrees bit-for-bit — what makes the DuckDB oracle mirror exact,
  * QueriesGraph `g13_kcore`):
  *
  *  - window form (`histogram = Some(false)`): max over neighbors of
  *    min(rank, value) with values sorted descending — the formula the
  *    oracle unrolls, but the per-destination rank window puts a hub's
  *    ENTIRE neighbor-value list into one window partition every superstep
  *    (a 10⁷-degree hub = a per-round skewed-key sort/spill);
  *  - histogram form (`histogram = Some(true)`, the hub-scale path): first
  *    collapse neighbor values to per-(dst, value) COUNTS — a hash
  *    aggregate with map-side combine, so the hub's 10⁷ rows shrink to at
  *    most #distinct-values ≤ maxCore+1 = O(√m) rows BEFORE the shuffle —
  *    then a cumulative count over the distinct values descending gives
  *    ccnt(val) = #{neighbors ≥ val} and H = max(min(ccnt, val)): within a
  *    tied-value block min(rank, value) is maximal at the block's last
  *    rank, which IS the cumulative count, so the two maxima coincide.
  *    The residual window sorts distinct values only (bounded rows/key).
  *
  * Default is AUTO: the histogram form costs one extra exchange per
  * superstep (the (dst, value) pre-aggregate), which measured SLOWER than
  * the window's in-partition sort up to a 10⁶-degree hub (HubBench:
  * window 15.0 s vs histogram 20.5 s total at H=10⁶, 8 cores — the sort
  * is cheap until a partition outgrows executor memory), while at
  * 10⁷⁺-degree hubs the window's per-superstep single-partition
  * sort/spill is the failure mode the histogram exists to kill. Auto
  * picks by max degree (= max c₀, one scalar aggregate before the loop)
  * against [[Coreness.HistogramDegreeThreshold]] — well below the spill
  * point, above every measured window win.
  *
  * Fixpoint/cap equivalence: if the sequence fixes at step t ≤ maxIter,
  * all later steps are identities, so "run to fixpoint capped at K" and
  * "run exactly K rounds" produce the SAME table — the registered oracle
  * unrolls exactly K rounds while this loop stops early on convergence.
  */
object Coreness {

  /** Auto-form cutover: max degree at which the per-superstep histogram
    * pre-aggregate pays for itself (scaladoc above — HubBench measured the
    * window form still ahead at 10⁶; spill danger starts ~10⁷ rows/
    * partition). */
  val HistogramDegreeThreshold: Int = 1 << 22

  /** @param edges     DataFrame(src: long, dst: long) — symmetrized
    *                   internally; self-loops dropped (simple-graph
    *                   semantics).
    * @param histogram  h-index form per superstep: Some(true) =
    *                   count-histogram (the hub-safe scale path),
    *                   Some(false) = the direct rank window (the oracle
    *                   formula), None = auto by max degree (scaladoc).
    *                   Identical output either way (spec-pinned ≡).
    * @return DataFrame(id: long, core: int) */
  def run(edges: DataFrame, numPartitions: Int = 32,
          maxIter: Int = 64, histogram: Option[Boolean] = None): DataFrame = {
    val spark = edges.sparkSession
    val P = numPartitions

    val sym = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .union(edges.select(col("dst").cast("long").as("src"),
                          col("src").cast("long").as("dst")))
      .where(col("src") =!= col("dst"))
      .dropDuplicates("src", "dst")
      .repartition(P, col("src"))
      .persist()

    val init0 = sym.groupBy(col("src").as("id"))
      .agg(count(lit(1)).cast("int").as("core"))
      .repartition(P, col("id"))
    val useHistogram = histogram.getOrElse {
      // c₀ IS the degree table — one scalar aggregate decides the form
      init0.agg(coalesce(max(col("core")), lit(0)).cast("int"))
        .collect()(0).getInt(0) >= HistogramDegreeThreshold
    }
    val init = init0.withColumn("changed", lit(1L))

    val cfg = Superstep.Config(P, maxIter, tol = 0.0)
    val res = try Superstep.run(spark, init, cfg) { (state, _) =>
      val nb = sym.join(state.select(col("id"), col("core").as("cv")),
        sym("src") === col("id"))
        .select(col("dst"), col("cv"))
      val h =
        if (useHistogram) {
          // hub-safe: collapse to per-(dst, value) counts first (map-side
          // combined), then cumulate over the ≤ O(√m) distinct values
          nb.groupBy(col("dst"), col("cv")).agg(count(lit(1)).as("c"))
            .withColumn("ccnt", sum(col("c")).over(
              Window.partitionBy(col("dst")).orderBy(col("cv").desc)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .groupBy(col("dst"))
            .agg(max(least(col("ccnt"), col("cv"))).cast("int").as("hcore"))
        } else nb
          .withColumn("rn",
            // rank order among TIED cv values is immaterial: the h-index
            // max(min(rn, cv)) is invariant under permuting equal values
            row_number().over(Window.partitionBy(col("dst"))
              .orderBy(col("cv").desc)))
          .groupBy(col("dst"))
          .agg(max(least(col("rn"), col("cv"))).cast("int").as("hcore"))
      // every vertex has ≥1 neighbor (vertices are edge-derived), so the
      // inner join is total
      state.select(col("id"), col("core").as("old"))
        .join(h, col("id") === h("dst"))
        .select(col("id"), col("hcore").as("core"),
          when(col("hcore") =!= col("old"), 1L).otherwise(0L).as("changed"))
    } { state =>
      state.agg(coalesce(sum(col("changed")), lit(0L))).collect()(0)
        .getLong(0).toDouble
    } finally sym.unpersist(false)

    res.state.select("id", "core")
  }
}
