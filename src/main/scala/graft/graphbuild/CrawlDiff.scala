package graft.graphbuild

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link churn between two crawl snapshots — the temporal complement of the
  * static link-graph family: given the url-level edge tables of two crawls
  * (e.g. two monthly Common-Crawl snapshots of the input_hint pages table,
  * split on `warc_ts`), classify every edge as added / removed / persisted
  * and aggregate per-host churn counts. Link-rot and growth-rate analysis
  * over crawl pairs is a standard web-graph job at corpus scale.
  *
  * Scale shape: ONE full-outer join co-partitioned on the (src, dst) pair
  * (both sides dedup'd first — algebraic, map-side combined), then one
  * host-keyed count aggregate. No driver-side state; at 10¹² edges the
  * join shuffles each side once on its natural key.
  */
object CrawlDiff {

  /** Edge-level diff: one row per url edge present in either snapshot,
    * (src, dst, status) with status ∈ added | removed | persisted
    * (relative to `a` → `b`: `added` = only in b, `removed` = only in a). */
  def edgeDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val fa = a.select(col("src"), col("dst")).dropDuplicates("src", "dst")
      .withColumn("__a", lit(1))
    val fb = b.select(col("src"), col("dst")).dropDuplicates("src", "dst")
      .withColumn("__b", lit(1))
    fa.join(fb, Seq("src", "dst"), "full_outer")
      .select(col("src"), col("dst"),
        when(col("__a").isNotNull && col("__b").isNotNull, "persisted")
          .when(col("__a").isNotNull, "removed")
          .otherwise("added").as("status"))
  }

  /** Host-level churn of link WEIGHT between two crawl snapshots — the
    * evolution of the contracted domain graph (the artifact Common Crawl
    * publishes per monthly crawl): each snapshot's url edges are contracted
    * with [[HostGraph.contract]] (dedup → eTLD+1 pairs → multiplicity), then
    * the two host graphs full-outer join on the host pair. One row per host
    * pair present in either snapshot:
    * (src_host, dst_host, w_a, w_b, delta, status) with delta = w_b − w_a
    * and status ∈ added | removed | persisted (a persisted pair can still
    * gain/lose weight — that's the delta).
    *
    * Scale shape: two contractions (each = the two algebraic aggregates of
    * [[HostGraph.contract]], map-side combined over the full url-edge
    * volume) and ONE full-outer join on (src_host, dst_host) over the
    * already-contracted (domain-cardinality, 10⁷-ish) tables — the join is
    * tiny relative to the scans feeding it. */
  def contractedDiff(a: DataFrame, b: DataFrame,
                     hostExpr: Column => Column = HostGraph.defaultHost)
  : DataFrame =
    diffContracted(HostGraph.contract(a, hostExpr),
      HostGraph.contract(b, hostExpr))

  /** The host-pair diff core of [[contractedDiff]], over two ALREADY
    * contracted (src_host, dst_host, weight) tables — for callers that
    * hold the contractions anyway (ranking reuses them; re-contracting
    * would re-scan the full url-edge volume). One classification home:
    * edge-level status lives in [[edgeDiff]], host-level here. */
  def diffContracted(ca0: DataFrame, cb0: DataFrame): DataFrame = {
    val ca = ca0.withColumnRenamed("weight", "w_a")
    val cb = cb0.withColumnRenamed("weight", "w_b")
    ca.join(cb, Seq("src_host", "dst_host"), "full_outer")
      .select(col("src_host"), col("dst_host"),
        coalesce(col("w_a"), lit(0L)).as("w_a"),
        coalesce(col("w_b"), lit(0L)).as("w_b"),
        (coalesce(col("w_b"), lit(0L)) - coalesce(col("w_a"), lit(0L)))
          .as("delta"),
        when(col("w_a").isNotNull && col("w_b").isNotNull, "persisted")
          .when(col("w_a").isNotNull, "removed")
          .otherwise("added").as("status"))
  }

  /** Per-host churn of an [[edgeDiff]] table, keyed by the SOURCE host
    * (the page doing the linking): (host, added, removed, persisted).
    * Hosts via `hostExpr` (default eTLD+1); null hosts dropped. */
  def hostChurn(diff: DataFrame,
                hostExpr: Column => Column = HostGraph.defaultHost)
  : DataFrame = {
    graft.ext.GraftExtensions.register(diff.sparkSession)
    diff.select(hostExpr(col("src")).as("host"), col("status"))
      .where(col("host").isNotNull)
      .groupBy("host")
      .agg(
        sum(when(col("status") === "added", 1L).otherwise(0L)).as("added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L)).as("removed"),
        sum(when(col("status") === "persisted", 1L).otherwise(0L))
          .as("persisted"))
  }
}
