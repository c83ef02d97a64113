package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-overlap link prediction over the undirected simple graph:
  * for every non-adjacent vertex pair sharing at least one neighbor,
  * common-neighbor count, Adamic–Adar (Σ 1/ln deg(z) over shared neighbors
  * z — every z is adjacent to both endpoints, so deg(z) ≥ 2 and the log is
  * never 0) and Jaccard (|N(a)∩N(b)| / |N(a)∪N(b)|). The classic
  * missing-link scores for a web link graph (Liben-Nowell & Kleinberg,
  * "The link-prediction problem for social networks", 2003); extends the
  * north-rule family — the reference has no prediction operator.
  *
  * Shape: ONE wedge self-join of the symmetrized adjacency on the shared
  * neighbor z (a < b orients each candidate pair once), partially
  * aggregated map-side into (pair → cn, aa), then an anti-join against the
  * existing edge set and a vertex-keyed degree join for Jaccard (|V|-sized
  * tables are never broadcast-hinted — AQE may still do so when a side is
  * genuinely small; the GraphStats rule). Work is
  * Σ_z deg(z)² — the standard wedge bound; at hub scale the caller caps it
  * by pre-filtering z with `maxDegree` (a hub shared by everything scores
  * ~0 AA anyway, the reason the cap is standard practice at corpus scale).
  */
object LinkPrediction {

  /** @param edges     DataFrame(src: long, dst: long) — symmetrized and
    *                  dedup'd internally; self-loops dropped.
    * @param topK      keep the strongest topK candidates, ranked by
    *                  (cn desc, a asc, b asc) — an all-integer order, so
    *                  rank is engine-reproducible (no float tie-breaks).
    * @param maxDegree optional wedge cap: shared neighbors with degree
    *                  above it are skipped (0 = no cap).
    * @return DataFrame(a, b, cn: long, aa: double, jaccard: double,
    *         rnk: int) with a < b, rnk ∈ [1, topK]. */
  def run(edges: DataFrame, topK: Int = 100, maxDegree: Int = 0,
          numPartitions: Int = 32): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .where(col("a") =!= col("b"))
      .dropDuplicates("a", "b")
      .repartition(numPartitions, col("a"))

    val sym = und.select(col("a").as("z"), col("b").as("n"))
      .union(und.select(col("b").as("z"), col("a").as("n")))
    val deg = sym.groupBy(col("z").as("id")).agg(count(lit(1)).as("deg"))

    val hub = if (maxDegree > 0) deg.where(col("deg") <= maxDegree) else deg
    // adjacency annotated with the shared neighbor's degree. The degree
    // table is ONE ROW PER VERTEX — it scales with the graph, so it joins
    // by key like every |V|-sized table in this package (GraphStats rule;
    // never a broadcast hint: at 10^12 vertices a forced broadcast bypasses
    // AQE's size check and OOMs). AQE still broadcasts a genuinely small
    // side at runtime on its own evidence.
    val adj = sym.join(hub, sym("z") === hub("id"))
      .select(col("z"), col("n"), col("deg"))

    val a1 = adj.select(col("z"), col("n").as("a"), col("deg"))
    val a2 = adj.select(col("z").as("z2"), col("n").as("b"))
    val cand = a1
      .join(a2, col("z") === col("z2") && col("a") < col("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("cn"),
        sum(lit(1.0) / log(col("deg").cast("double"))).as("aa"))

    val nonEdge = cand.join(und, Seq("a", "b"), "left_anti")

    val dega = deg.select(col("id").as("a"), col("deg").as("dega"))
    val degb = deg.select(col("id").as("b"), col("deg").as("degb"))
    val scored = nonEdge
      .join(dega, Seq("a"))
      .join(degb, Seq("b"))
      .select(col("a"), col("b"), col("cn"), col("aa"),
        (col("cn").cast("double") /
          (col("dega") + col("degb") - col("cn"))).as("jaccard"))

    // global top-K on an all-integer key: distributed TakeOrdered, then the
    // driver-sized survivors get their rank from a window over ≤ topK rows
    import org.apache.spark.sql.expressions.Window
    scored.orderBy(col("cn").desc, col("a").asc, col("b").asc).limit(topK)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("cn").desc, col("a").asc, col("b").asc)))
  }
}
