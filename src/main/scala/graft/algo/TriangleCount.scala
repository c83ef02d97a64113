package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting on the undirected simple graph (north-rule
  * operator). Non-iterative — three joins, no supersteps.
  *
  * Scale design: the classic degree-orientation trick. Every undirected edge
  * is directed from the endpoint with (smaller degree, smaller id) to the
  * larger one; then every triangle appears EXACTLY once as an oriented wedge
  * (u→v, u→w) closed by the oriented edge (v→w). Orienting by degree bounds
  * each vertex's oriented out-degree by O(√m) on any graph, so the wedge
  * self-join — the quadratic danger on power-law hubs — generates
  * O(m^{3/2}) wedges instead of Σdeg² (which a 10^8-degree hub would make
  * fatal). This is the standard distributed-triangle formulation (cf. Suri &
  * Vassilvitskii, WWW'11).
  *
  * No global ordering/ranking step is needed: the destination's degree is
  * carried on each oriented edge, so the canonical wedge order and the
  * closing-edge join are plain column comparisons — every stage is a
  * hash-partitioned join or aggregation (no single-partition window).
  */
object TriangleCount {

  /** Total triangle count. */
  def total(edges: DataFrame, numPartitions: Int = 32): Long =
    perVertexAndTotal(edges, numPartitions)._2

  /** (deg, id)-oriented edge table (u, v, vdeg) off a canonical (a < b)
    * undirected simple edge set and its degree table (id, deg): every edge
    * directed from the endpoint with smaller (deg, id) to the larger one,
    * carrying the head's degree for canonical wedge ordering. This is THE
    * hub-safe orientation (out-degree bounded O(√m)); every triangle
    * enumerator in the engine must build wedges from this table, never from
    * an id-ordered one (Σdeg² hub blow-up — VERDICT r4 #1). */
  def orient(und: DataFrame, deg: DataFrame): DataFrame = {
    val da = deg.select(col("id").as("a"), col("deg").as("dega"))
    val db = deg.select(col("id").as("b"), col("deg").as("degb"))
    val aFirst = col("dega") < col("degb") ||
      (col("dega") === col("degb") && col("a") < col("b"))
    und.join(da, "a").join(db, "b")
      .select(
        when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"),
        when(aFirst, col("degb")).otherwise(col("dega")).as("vdeg"))
  }

  /** Triangle enumeration off an oriented (u, v, vdeg) table: wedges
    * (u→v, u→w) canonically ordered by the carried (deg, id), closed by the
    * oriented edge (v→w). One row per triangle, endpoints in orientation
    * order — callers needing canonical id pairs re-canonicalize with
    * least/greatest. */
  def closeWedges(oriented: DataFrame): DataFrame = {
    val e1 = oriented.select(col("u"), col("v"), col("vdeg"))
    val e2 = oriented.select(col("u"), col("v").as("w"), col("vdeg").as("wdeg"))
    val wedges = e1.join(e2, "u").where(
      col("vdeg") < col("wdeg") ||
        (col("vdeg") === col("wdeg") && col("v") < col("w")))
    val closing = oriented.select(col("u").as("v"), col("v").as("w"))
    wedges.join(closing, Seq("v", "w"), "left_semi")
      .select(col("u"), col("v"), col("w"))
  }

  /** Per-vertex triangle participation counts + global total.
    * @param edges DataFrame(src: long, dst: long); direction ignored.
    * @return (DataFrame(id, triangles), total) — vertices in no triangle
    *         are present with 0. */
  def perVertexAndTotal(edges: DataFrame, numPartitions: Int = 32): (DataFrame, Long) = {
    val P = numPartitions
    // undirected simple edge set as canonical (lo, hi) pairs
    val und = edges
      .select(least(col("src"), col("dst")).cast("long").as("a"),
              greatest(col("src"), col("dst")).cast("long").as("b"))
      .where(col("a") =!= col("b"))
      .dropDuplicates("a", "b")
      .persist()

    val deg = und.select(col("a").as("id")).union(und.select(col("b").as("id")))
      .groupBy("id").agg(count("*").as("deg"))
      .persist()

    val oriented = orient(und, deg)
      .repartition(P, col("u"))
      .persist()
    oriented.count()
    und.unpersist(false)

    val tris = closeWedges(oriented).persist()

    val totalCnt = tris.count()
    oriented.unpersist(false) // dead once tris is materialized
    val perVertex = tris.select(col("u").as("id"))
      .union(tris.select(col("v").as("id")))
      .union(tris.select(col("w").as("id")))
      .groupBy("id").agg(count("*").as("triangles"))
    val all = deg.select(col("id"))
      .join(perVertex, Seq("id"), "left")
      .na.fill(0L, Seq("triangles"))
    (all, totalCnt)
  }
}
