package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss of the undirected simple graph: the maximal subgraph in which
  * every edge closes at least k-2 triangles *within the subgraph* (Cohen,
  * "Trusses: cohesive subgraphs for social network analysis", 2008). The
  * truss is the edge-analog of the k-core — the standard link-graph
  * community-density peel one tier stronger than coreness. Extends the
  * north-rule algorithm family; the reference has no density operator.
  *
  * Algorithm: synchronous peel. Each round computes per-edge support
  * (triangle count) over the CURRENT surviving edge set via the same
  * degree-oriented wedge join TriangleCount pins (edges ordered a < b, so
  * each triangle (u,v,w), u<v<w, is enumerated exactly once and credits its
  * three edges), then drops every edge with support < k-2 — all at once,
  * not one-at-a-time. Simultaneous removal converges to the same fixpoint
  * as the sequential peel (the k-truss is the unique maximal fixpoint, and
  * every edge the synchronous round removes is removed by any sequential
  * order too).
  *
  * Fixpoint/cap equivalence (the g13 argument): support is INTEGER and the
  * edge set only shrinks, so once a round removes nothing every later round
  * is an identity — "run to fixpoint capped at K" and "run exactly K
  * rounds" yield the same table, which is what lets the DuckDB oracle
  * unroll exactly K rounds (QueriesGraph `g15_ktruss`) while this loop
  * stops early.
  *
  * Scale shape: each round is ONE triangle enumeration on the *surviving*
  * set — work is monotonically non-increasing, and the wedge join inherits
  * TriangleCount's skew posture (the a < b orientation caps wedge fan-out
  * by the lower-id endpoint's degree). State is a materialized leaf per
  * round (localCheckpoint via Superstep), so the triple self-reference per
  * round reads a flat scan, not a growing plan chain. Convergence is a
  * row-count delta off the CACHED state (a captured counter, not a second
  * evaluation of the wedge join — a carried `changed` column would embed
  * the triangle subplan twice per round, once under the survivors filter
  * and once under its own aggregate).
  */
object KTruss {

  /** @param edges DataFrame(src: long, dst: long) — symmetrized/oriented
    *              internally; self-loops dropped (simple-graph semantics).
    * @param k     truss order (k ≥ 3; k-2 = required per-edge support).
    * @return DataFrame(a: long, b: long, support: long) with a < b — the
    *         surviving edges and their triangle count within the truss. */
  def run(edges: DataFrame, k: Int, numPartitions: Int = 32,
          maxIter: Int = 64): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    val spark = edges.sparkSession
    val P = numPartitions

    // orient undirected edges low→high once; dedup parallel edges
    val und = edges
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .where(col("a") =!= col("b"))
      .dropDuplicates("a", "b")

    val init = und
      .repartition(P, col("a"))
      .withColumn("support", lit(0L))

    // dropped-this-round = previous row count minus current row count; both
    // reads are O(1) jobs over the materialized (cached) state
    var prevCount = -1L
    val cfg = Superstep.Config(P, maxIter, tol = 0.0)
    val res = Superstep.run(spark, init, cfg) { (state, _) =>
      val e = state.select("a", "b")
      // one row per triangle (u,v,w), u<v<w: wedge (u,v)+(u,w) closed by (v,w)
      val e1 = e.select(col("a").as("u"), col("b").as("v"))
      val e2 = e.select(col("a").as("u2"), col("b").as("w"))
      val e3 = e.select(col("a").as("v3"), col("b").as("w3"))
      val tri = e1
        .join(e2, col("u") === col("u2") && col("w") > col("v"))
        .join(e3, col("v") === col("v3") && col("w") === col("w3"))
        .select(col("u"), col("v"), col("w"))
      val sup = tri.select(col("u").as("a"), col("v").as("b"))
        .union(tri.select(col("u").as("a"), col("w").as("b")))
        .union(tri.select(col("v").as("a"), col("w").as("b")))
        .groupBy("a", "b").agg(count(lit(1)).as("sup"))
      e.join(sup, Seq("a", "b"), "left")
        .select(col("a"), col("b"),
          coalesce(col("sup"), lit(0L)).as("support"))
        .where(col("support") >= lit(k - 2).cast("long"))
    } { state =>
      val c = state.count()
      val dropped = if (prevCount < 0) Long.MaxValue else prevCount - c
      prevCount = c
      dropped.toDouble
    }

    res.state.select("a", "b", "support")
  }
}
