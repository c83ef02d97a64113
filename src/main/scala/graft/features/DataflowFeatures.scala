package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-node dataflow features (reference:
  * /root/reference/code/features/dataflow.py:8-155, SURVEY.md §2.4 A8):
  * storage get/set counts, redirect sent/received counts + max incoming
  * redirect-chain depth (G9), request-flow counts.
  *
  * The reference filters the whole edge table once PER NODE per feature; we
  * fuse every count into ONE groupBy over each edge direction — a constant
  * number of shuffles for all nodes of all visits (the engine's core win,
  * SURVEY.md §3 E1).
  *
  * Statuses are normalized to int at ingest (SURVEY §2.11.4), so the
  * reference's int+str dual IN-list collapses to one `isin`.
  */
object DataflowFeatures {

  private val redirectStatuses = Seq(300, 301, 302, 303, 307, 308)

  /** G9: max incoming redirect-chain depth per node — iterative
    * depth(dst) = max(depth(src)+1) over the 3xx-status subgraph, to
    * fixpoint (redirect chains are short; converges in < 10 steps).
    *
    * Termination on redirect CYCLES (a 3xx loop would relax forever): the
    * longest simple backward path in a visit cannot exceed that visit's
    * redirect-edge count, so iterations are bounded by the largest
    * per-visit edge count (one scalar agg). Acyclic graphs converge and
    * exit early as before; cycle members saturate at the bound — a
    * documented deviation from the reference's nx.edge_dfs run-length
    * scan (utils.py:147-186), whose cycle answer is traversal-order
    * dependent and not reproducible as a distributed fixpoint. */
  def redirectDepths(edges: DataFrame, maxIter: Int = 64): DataFrame = {
    val red = edges
      .where(expr("try_cast(response_status AS int)").isin(redirectStatuses: _*))
      .select(col("visit_id"), col("src"), col("dst")).distinct()
      .persist()
    val verts = red.select(col("visit_id"), col("src").as("name"))
      .union(red.select(col("visit_id"), col("dst").as("name"))).distinct()

    val bound = red.groupBy(col("visit_id")).count()
      .agg(max(col("count"))).collect()(0) match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
    val effectiveMax = math.min(maxIter.toLong, bound)

    var depth = verts.withColumn("depth", lit(0L)).persist()
    depth.count()
    var changed = true
    var i = 0
    while (changed && i < effectiveMax) {
      i += 1
      val relaxed = red
        .join(depth.select(col("visit_id"), col("name").as("src"),
          col("depth").as("sd")), Seq("visit_id", "src"))
        .groupBy(col("visit_id"), col("dst").as("name"))
        .agg(max(col("sd") + 1L).as("nd"))
      val next = depth.join(relaxed, Seq("visit_id", "name"), "left")
        .select(col("visit_id"), col("name"),
          greatest(col("depth"), coalesce(col("nd"), col("depth"))).as("depth"),
          (coalesce(col("nd"), col("depth")) > col("depth")).as("chg"))
        .persist()
      changed = next.where(col("chg")).count() > 0
      val nd = next.drop("chg").localCheckpoint(true)
      // depth is a checkpoint after the first pass — Dataset.unpersist
      // would silently no-op on it (graft.core.Checkpoints doc)
      graft.core.Checkpoints.release(depth)
      next.unpersist(false)
      depth = nd
    }
    red.unpersist(false)
    depth.withColumnRenamed("depth", "max_depth_redirect")
  }

  /** All per-node dataflow counts in two fused aggregations (one per edge
    * direction) plus the redirect-depth fixpoint. */
  def dataflow(edges: DataFrame): DataFrame = {
    val isRedirect = expr("try_cast(response_status AS int)").isin(redirectStatuses: _*)
    val isHttpReq = col("reqattr").isNotNull && col("reqattr") =!= "CS" &&
      col("reqattr") =!= "N/A"

    val asSrc = edges.groupBy(col("visit_id"), col("src").as("name")).agg(
      sum(when(col("action").isin("get", "get_js"), 1L).otherwise(0L))
        .as("num_get_cookie"),
      sum(when(col("action").isin("set", "set_js"), 1L).otherwise(0L))
        .as("num_set_cookie"),
      sum(when(col("action") === "get_storage_js", 1L).otherwise(0L))
        .as("num_get_ls"),
      sum(when(col("action") === "set_storage_js", 1L).otherwise(0L))
        .as("num_set_ls"),
      sum(when(isRedirect, 1L).otherwise(0L)).as("num_redirects_sent"),
      sum(when(isHttpReq, 1L).otherwise(0L)).as("num_requests_sent"))

    val asDst = edges.groupBy(col("visit_id"), col("dst").as("name")).agg(
      sum(when(isRedirect, 1L).otherwise(0L)).as("num_redirects_rec"),
      sum(when(isHttpReq, 1L).otherwise(0L)).as("num_requests_received"))

    val depths = redirectDepths(edges)

    asSrc.join(asDst, Seq("visit_id", "name"), "full_outer")
      .join(depths, Seq("visit_id", "name"), "left")
      .na.fill(0L)
      .withColumn("num_get_storage", col("num_get_cookie") + col("num_get_ls"))
      .withColumn("num_set_storage", col("num_set_cookie") + col("num_set_ls"))
      .drop("num_get_ls", "num_set_ls")
  }
}
