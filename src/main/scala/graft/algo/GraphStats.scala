package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-shot whole-graph statistics over an edge table (src, dst) — the
  * non-iterative complements of the superstep family: local clustering
  * coefficient, community modularity, and degree assortativity. All three
  * are pure declarative plans (joins + aggregates, no loop state), so
  * Catalyst owns the physical strategy end-to-end.
  *
  * Semantics follow the networkx conventions the reference's feature layer
  * leans on (reference graph metrics: code/features/graph.py):
  *  - graphs are simplified undirected: each {a,b} pair counts once,
  *    self-loops dropped by the caller's edge derivation;
  *  - `clustering`: cc(v) = 2·T(v) / d(v)(d(v)−1), 0 below degree 2
  *    (nx.clustering);
  *  - `modularityContrib`: Newman Q per-community decomposition
  *    q_c = e_c/m − (D_c/2m)² with Q = Σ q_c (nx.community.modularity);
  *  - `assortativity`: Pearson r over the degree pairs of every edge stub
  *    (both orientations), nx.degree_assortativity_coefficient.
  *
  * Scale notes: every join here is keyed on vertex ids (shuffle-partitioned
  * by key; AQE may still broadcast a genuinely small side at runtime — we
  * never hint a |V|-sized table as broadcast). The only driver-visible
  * values are single-row aggregates.
  */
object GraphStats {

  /** Simplified undirected edge set: one (a<b) row per distinct pair. */
  private def undirected(edges: DataFrame): DataFrame =
    edges
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .dropDuplicates("a", "b")

  /** Both stubs of each undirected edge: (p, q) and (q, p). */
  private def stubs(und: DataFrame): DataFrame =
    und.select(col("a").as("p"), col("b").as("q"))
      .union(und.select(col("b").as("p"), col("a").as("q")))

  /** Degrees off an already-derived undirected edge set — callers that
    * hold `und` use this so the O(|E|) dedup aggregate is planned once
    * per metric (exchange reuse would usually dedup the identical
    * subtree anyway; sharing the reference guarantees it). */
  private def degreesOf(und: DataFrame): DataFrame =
    stubs(und).groupBy(col("p").as("id")).agg(count(lit(1)).as("deg"))

  /** Undirected simple degree per vertex: (id, deg). */
  def degrees(edges: DataFrame): DataFrame = degreesOf(undirected(edges))

  /** Local clustering coefficient per vertex: (id, deg, triangles, cc),
    * cc rounded to 8dp (engine-portable float policy, same as PageRank's
    * oracle rounding). Triangle counts ride [[TriangleCount]]'s ordered
    * wedge join; vertices with no triangles appear with triangles=0. */
  def clustering(edges: DataFrame, numPartitions: Int): DataFrame = {
    val (pv, _) = TriangleCount.perVertexAndTotal(edges, numPartitions)
    degrees(edges).join(pv, Seq("id"), "left")
      .na.fill(0L, Seq("triangles"))
      .select(col("id"), col("deg"), col("triangles"),
        round(when(col("deg") >= 2,
          lit(2.0) * col("triangles") / (col("deg") * (col("deg") - 1)))
          .otherwise(0.0), 8).as("cc"))
  }

  /** Per-community modularity contributions for a vertex→community table
    * `labels` (id, label): (label, ec, dc, q_contrib) where ec = in-community
    * edges, dc = total community degree, q_contrib = ec/m − (dc/2m)², 8dp.
    * Global Q is the sum of q_contrib. ec/dc/m stay exact BIGINT; the float
    * formula is one fixed expression tree. */
  def modularityContrib(edges: DataFrame, labels: DataFrame): DataFrame = {
    val und = undirected(edges)
    val mAgg = und.agg(count(lit(1)).as("m")) // scalar: broadcast is exact
    val la = labels.select(col("id").as("a"), col("label").as("la"))
    val lb = labels.select(col("id").as("b"), col("label").as("lb"))
    val ec = und.join(la, Seq("a")).join(lb, Seq("b"))
      .where(col("la") === col("lb"))
      .groupBy(col("la").as("label")).agg(count(lit(1)).as("ec"))
    val dc = labels.join(degreesOf(und), Seq("id"))
      .groupBy(col("label")).agg(sum(col("deg")).as("dc"))
    val half = col("dc").cast("double") / (lit(2) * col("m"))
    dc.join(ec, Seq("label"), "left").na.fill(0L, Seq("ec"))
      .crossJoin(broadcast(mAgg))
      .select(col("label"), col("ec"), col("dc"),
        round(col("ec").cast("double") / col("m") - half * half, 8)
          .as("q_contrib"))
  }

  /** Per-community conductance for a vertex→community table `labels`
    * (id, label): (label, cut, vol, conductance) where cut = boundary
    * edges (exactly one endpoint in the community), vol = Σ deg(v) over
    * the community, conductance = cut / min(vol, 2m − vol) (nx
    * `conductance(G, S)` with the complement-aware denominator), 8dp;
    * 0.0 when the denominator is degenerate. cut/vol/m stay exact BIGINT.
    *
    * Shape: one labels⋈edges pass tags each undirected edge with both
    * endpoint labels; cross-label edges contribute one boundary count to
    * EACH side via a two-branch union aggregated map-side. Communities
    * with an empty boundary appear with cut=0. */
  def conductance(edges: DataFrame, labels: DataFrame): DataFrame = {
    val und = undirected(edges)
    val mAgg = und.agg(count(lit(1)).as("m")) // scalar: in-plan cross join
    val la = labels.select(col("id").as("a"), col("label").as("la"))
    val lb = labels.select(col("id").as("b"), col("label").as("lb"))
    val tagged = und.join(la, Seq("a")).join(lb, Seq("b"))
    val cross = tagged.where(col("la") =!= col("lb"))
    val cut = cross.select(col("la").as("label"))
      .union(cross.select(col("lb").as("label")))
      .groupBy("label").agg(count(lit(1)).as("cut"))
    val vol = labels.join(degreesOf(und), Seq("id"))
      .groupBy(col("label")).agg(sum(col("deg")).as("vol"))
    val denom = least(col("vol").cast("double"),
      lit(2) * col("m") - col("vol").cast("double"))
    vol.join(cut, Seq("label"), "left").na.fill(0L, Seq("cut"))
      .crossJoin(broadcast(mAgg))
      .select(col("label"), col("cut"), col("vol"),
        round(when(denom > 0, col("cut").cast("double") / denom)
          .otherwise(0.0), 8).as("conductance"))
  }

  /** Degree assortativity: one row (n, assortativity) where n = 2|E| stub
    * pairs and assortativity = Pearson r over (deg(p), deg(q)) of every
    * stub, 8dp; 0.0 when the variance product is degenerate (regular
    * graphs). The six sums ride DECIMAL(38,0) — Σ deg² over stubs is d³
    * per degree-d vertex, which wraps a silent Long at hub degrees ≥ ~2²¹
    * (routine on web graphs); decimal keeps them exact up to 10³⁸
    * (Σ d² ≤ 2|E|·d²max ≈ 10³⁶ at the 10¹²-edge tier). The closed-form
    * float evaluation at the end is order-independent. The degree table
    * joins by key (never a broadcast hint: |V| scales with the graph). */
  def assortativity(edges: DataFrame): DataFrame = {
    val und = undirected(edges)
    val deg = degreesOf(und)
    val dj = deg.select(col("id").as("p"), col("deg").as("j"))
    val dk = deg.select(col("id").as("q"), col("deg").as("k"))
    val (j, k) = (col("j").cast("decimal(19,0)"), col("k").cast("decimal(19,0)"))
    val sums = stubs(und).join(dj, Seq("p")).join(dk, Seq("q"))
      .agg(count(lit(1)).as("n"), sum(j).as("sj"),
        sum(k).as("sk"), sum(j * k).as("sjk"),
        sum(j * j).as("sj2"), sum(k * k).as("sk2"))
    val nD = col("n").cast("double")
    val denom = (nD * col("sj2") - col("sj").cast("double") * col("sj")) *
      (nD * col("sk2") - col("sk").cast("double") * col("sk"))
    sums.select(col("n"),
      round(when(denom > 0,
        (nD * col("sjk") - col("sj").cast("double") * col("sk")) /
          sqrt(denom)).otherwise(0.0), 8).as("assortativity"))
  }
}
