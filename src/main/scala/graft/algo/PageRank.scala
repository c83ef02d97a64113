package graft.algo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PageRank as typed DataFrame joins/aggregations (north rule:
  * no GraphX/RDD). Standard formulation with dangling-mass redistribution:
  *
  *   rank'(v) = (1-d)/N + d * ( Σ_{u→v} rank(u)/outdeg(u) + D/N )
  *   where D = Σ_{outdeg(u)=0} rank(u)
  *
  * Execution shape per superstep (see Superstep for the loop invariants):
  *   state(id, rank, deg, delta)  — hash-partitioned by id, P partitions
  *   edges(src, dst)              — cached, hash-partitioned by src, P parts
  *
  *   contrib = edges ⋈ state ON src=id        (CO-PARTITIONED — no shuffle of
  *                                             either side after warmup)
  *           groupBy(dst) sum(rank/deg)       (THE one shuffle per superstep)
  *   state'  = state ⋈ contrib ON id=dst      (both sides hash-clustered on
  *                                             their join key — no extra
  *                                             exchange) + dangling term
  *
  * The dangling sum and the convergence measure ride inside the state as
  * aggregable columns, so exactly one scalar action reaches the driver per
  * superstep. Skew note: power-law in-degree hubs make the groupBy(dst) the
  * hot spot; sum() is algebraic, so Spark's partial (map-side) aggregation
  * already combines per input partition before the exchange — the per-reducer
  * load for a hub key is bounded by #map-partitions, not by in-degree, which
  * is why we keep sum() rather than a salted two-phase variant here (the
  * salted path only pays off for non-algebraic aggregates, cf. SURVEY.md §4.2).
  */
object PageRank {

  final case class Params(
      damping: Double = 0.85,
      tol: Double = 1e-6,
      maxIter: Int = 100,
      numPartitions: Int = 32,
      dangling: Boolean = true,
      /** Input edges already arrive hash-clustered on `src` with long ids
        * (a bucketed catalog read — graft.sources.BucketedEdges), so skip
        * the per-run `repartition(P, src)` AND the long cast: the cast
        * would re-alias the column and the projected partitioning would no
        * longer cover the join key, silently re-introducing the exchange.
        * Correct for any input (EnsureRequirements inserts whatever the
        * join still needs); the no-shuffle payoff requires buckets ==
        * numPartitions. */
      prePartitioned: Boolean = false,
      /** Optional edge-weight column (POSITIVE weights — multi-link
        * multiplicity, anchor-text scores): rank propagates proportionally,
        * rank(u)·w(u→v)/Σ_x w(u→x), the networkx `pagerank(weight=…)`
        * semantics. None = classic uniform split (plan unchanged — the
        * weighted path swaps count(*) for sum(w) in the degree pass and
        * multiplies the per-edge contribution, nothing else). */
      weightCol: Option[String] = None
  )

  /** @param edges DataFrame(src: long, dst: long) — deduplicated digraph.
    * @param warmStart optional previous ranks (id, rank) — incremental
    *        recompute: after a small edge delta, starting from the prior
    *        converged ranks reaches tol in far fewer supersteps than the
    *        uniform cold start. New vertices get 1/N; mass renormalizes to
    *        1 so the convergence contract is unchanged.
    * @param reset optional personalization DataFrame(id, p): teleport
    *        lands on these vertices proportionally to `p` (normalized
    *        internally; vertices absent from `reset` teleport-weight 0),
    *        and dangling mass redistributes by the same vector — networkx
    *        `pagerank(personalization=…)` semantics. None = uniform
    *        teleport (classic PageRank; plan unchanged from the
    *        non-personalized path).
    * @return DataFrame(id: long, rank: double), ranks summing to ~1. */
  def run(edges: DataFrame, p: Params = Params(),
          cfg0: Option[Superstep.Config] = None,
          warmStart: Option[DataFrame] = None,
          reset: Option[DataFrame] = None): Superstep.Result = {
    val spark = edges.sparkSession
    val P = p.numPartitions

    // weighted path: carry the weight column as canonical "w" (double)
    val wSel: Seq[Column] = p.weightCol.toSeq.map(c => col(c).cast("double").as("w"))
    val e =
      if (p.prePartitioned) {
        val idTypes = Seq("src", "dst").map(c =>
          edges.schema(c).dataType)
        require(idTypes.forall(_ == org.apache.spark.sql.types.LongType),
          s"prePartitioned input must carry long ids, got $idTypes")
        edges.select(Seq(col("src"), col("dst")) ++ wSel: _*).persist()
      } else edges.select(Seq(col("src").cast("long"),
          col("dst").cast("long")) ++ wSel: _*)
        .repartition(P, col("src"))
        .persist()

    // vertex set = src ∪ dst; outdegree (weighted: out-weight sum — the
    // divisor of the proportional split) via one pass over edges
    val outDeg = p.weightCol match {
      case None    => e.groupBy(col("src").as("id")).agg(count("*").as("deg"))
      case Some(_) => e.groupBy(col("src").as("id")).agg(sum(col("w")).as("deg"))
    }
    val vertsBase = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .join(outDeg, Seq("id"), "left")
      .na.fill(0L, Seq("deg"))
    // personalization: attach raw teleport weights before the persist so the
    // cached vertex table is self-contained (broadcast-joinable small dim)
    val verts = (reset match {
      case None => vertsBase
      case Some(r) =>
        val rr = r.select(col("id").cast("long").as("id"),
            col("p").cast("double").as("__p0"))
          .dropDuplicates("id") // duplicate reset ids would double weight
        vertsBase.join(rr, Seq("id"), "left").na.fill(0.0, Seq("__p0"))
    }).repartition(P, col("id"))
      .persist()
    val n = verts.count() // also materializes the cached vertex table
    if (n == 0) {
      // empty graph (reachable from streaming first/empty micro-batches):
      // 1/n and the max(delta) measure are both undefined — return the
      // empty result instead of NaN ranks / an NPE in the measure
      val empty = verts.select(col("id"), lit(0.0).as("rank"))
      e.unpersist(false); verts.unpersist(false)
      return Superstep.Result(empty, 0, Seq.empty)
    }
    val d = p.damping

    // normalized teleport column (rides the superstep state like `deg`);
    // one scalar action off the cached verts, only on the personalized path
    val pCol: Option[Column] = reset.map { _ =>
      val t = verts.agg(sum(col("__p0"))).collect()(0).getDouble(0)
      require(t > 0.0,
        "personalization must put positive mass on at least one graph vertex")
      (col("__p0") / t).as("p")
    }
    def withP(cols: Column*): Seq[Column] = cols ++ pCol.toSeq

    val init = warmStart match {
      case None => verts.select(withP(
        col("id"), lit(1.0 / n).as("rank"), col("deg"),
        lit(Double.MaxValue).as("delta")): _*)
      case Some(w) =>
        // no persist: `joined` is one cheap join off the cached verts —
        // it runs once for the mass total and once when Superstep
        // materializes the init state
        val joined = verts
          .join(w.select(col("id"), col("rank").as("r0"))
            .dropDuplicates("id"), // duplicate warm ids would fan out state
            Seq("id"), "left")
          .na.fill(1.0 / n, Seq("r0"))
        val total = joined.agg(sum(col("r0"))).collect()(0).getDouble(0)
        joined.select(withP(col("id"), (col("r0") / total).as("rank"),
          col("deg"), lit(Double.MaxValue).as("delta")): _*)
    }

    val cfg = cfg0.getOrElse(Superstep.Config(P, p.maxIter, p.tol))

    // finally, not post-hoc: an abort inside the superstep loop (failed
    // commit, interrupted convergence) must still drop the cached edge and
    // vertex tables, or they pin block-manager storage for the session
    val res = try Superstep.run(spark, init, cfg) { (state, _) =>
      // dangling mass of the CURRENT ranks — computed as a broadcastable
      // 1-row aggregate folded into the plan (no separate driver action)
      val danglingMass =
        if (p.dangling)
          state.agg(coalesce(sum(when(col("deg") === 0, col("rank"))), lit(0.0))
            .as("dm"))
        else spark.range(1).select(lit(0.0).as("dm"))

      // weighted: each edge carries rank(u)·w/outw(u); classic: rank(u)/deg(u)
      val perEdge =
        if (p.weightCol.isEmpty) col("c") else col("c") * col("w")
      val contrib = e
        .join(state.where(col("deg") > 0)
                   .select(col("id"), (col("rank") / col("deg")).as("c")),
              e("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(perEdge).as("msum"))

      // teleport + dangling landing: uniform 1/n classically, the
      // personalization vector when present (networkx semantics)
      val rankExpr =
        if (reset.isEmpty)
          lit((1.0 - d) / n) +
            lit(d) * (coalesce(col("msum"), lit(0.0)) + col("dm") / n)
        else
          lit(1.0 - d) * col("p") +
            lit(d) * (coalesce(col("msum"), lit(0.0)) + col("dm") * col("p"))
      val carry = if (reset.isEmpty) Seq.empty else Seq(col("p"))
      state.select(Seq(col("id"), col("rank").as("prev"), col("deg")) ++
          carry: _*)
        .join(contrib, col("id") === contrib("dst"), "left")
        .crossJoin(broadcast(danglingMass))
        .select(Seq(col("id"), rankExpr.as("rank"), col("deg"),
          col("prev")) ++ carry: _*)
        .withColumn("delta", abs(col("rank") - col("prev")))
        .drop("prev")
        // canonical order: init and every step emit the same schema
        .select(Seq(col("id"), col("rank"), col("deg"), col("delta")) ++
          carry: _*)
    } { state =>
      state.agg(coalesce(max(col("delta")), lit(0.0))).collect()(0).getDouble(0)
    } finally { e.unpersist(false); verts.unpersist(false) }

    res.copy(state = res.state.select("id", "rank"))
  }
}
