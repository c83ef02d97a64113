package graft.webgraph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.GraftExtensions

/** HTTP-header cookie graph construction (reference:
  * /root/reference/code/graph/http_storage_edges.py — SURVEY.md §2.3 J6,
  * §2.7 F9): request edges whose headers carry Cookie / Set-Cookie are
  * exploded into per-cookie edges from the requested URL to the cookie-key
  * node.
  *
  * Headers are OpenWPM's JSON list of [name, value] pairs; cookie payloads
  * parse via [[CookieParse]] (re-expressed RFC-6265-style scanner, not the
  * vendored CPython module). The whole path — header scan, cookie parse,
  * attr-JSON build (escaped via graft.core.Json so quoted values survive
  * the round trip into get_json_object), eTLD+1 — plans as native
  * codegen'd expressions (graft.ext.CookieExpressions): no ScalaUDF node
  * remains in this construction plan.
  */
object HttpCookieGraph {

  /** Cookie edges from HTTP request edges.
    * @param httpEdges  output of [[RequestGraph.build]] (edges)
    * @param httpNodes  output of [[RequestGraph.requestNodes]]
    * @return (cookieNodes, cookieEdges) */
  def build(httpEdges: DataFrame, httpNodes: DataFrame): (DataFrame, DataFrame) = {
    GraftExtensions.register(httpEdges.sparkSession)
    // prefilter must be a SUPERSET of the combined-list header scan below:
    // every name the scan matches ("Cookie", "Set-Cookie", "set-cookie")
    // can appear on EITHER side (the reference indexes one MultiDict over
    // reqattr+respattr combined). contains("Cookie") subsumes "Set-Cookie";
    // the lowercase variant needs its own check on both sides.
    val bearing = httpEdges.where(
      col("reqattr").contains("Cookie") ||
        col("respattr").contains("Cookie") ||
        col("reqattr").contains("set-cookie") ||
        col("respattr").contains("set-cookie"))

    // both header lists feed BOTH scans: the reference indexes one MultiDict
    // built over reqattr+respattr combined (http_storage_edges.py:84-89)
    val detailed = bearing
      .withColumn("gets",
        call_function("cookie_get_triples",
          coalesce(col("reqattr"), lit("")), coalesce(col("respattr"), lit(""))))
      .withColumn("sets",
        call_function("cookie_set_triples",
          coalesce(col("reqattr"), lit("")), coalesce(col("respattr"), lit(""))))
      // explode_OUTER + isNotNull: plain explode would infer a pushed-down
      // size() filter that re-parses both cookie headers per row
      // (Dedup.shingleTable documents the optimizer shape)
      .withColumn("d", explode_outer(concat(col("gets"), col("sets"))))
      .where(col("d").isNotNull)
      .select(col("visit_id"), col("dst").as("req_url"),
        col("d._1").as("cname"), col("d._2").as("action"),
        col("d._3").as("attr"), col("time_stamp"))

    // J6: attach top_level_url from the request node of the requested url
    val nodeTlu = httpNodes
      .select(col("visit_id"), col("name").as("req_url"),
        col("top_level_url"))
      .dropDuplicates("visit_id", "req_url")
    val withTlu = detailed.join(nodeTlu, Seq("visit_id", "req_url"))
      .withColumn("domain", call_function("etld1", col("req_url")))
      .withColumn("ckey", concat_ws("|$$|", col("cname"), col("domain")))

    val nodes = withTlu
      .select(col("visit_id"), col("ckey").as("name"), col("top_level_url"),
        col("domain"))
      .dropDuplicates()
      .withColumn("type", lit("Storage"))
      .withColumn("attr", lit("""{"cookie_type": "HTTPCookie"}"""))

    val edges = withTlu.select(col("visit_id"), col("req_url").as("src"),
        col("ckey").as("dst"), col("top_level_url"), col("action"),
        col("attr"), col("time_stamp"))
      .withColumn("reqattr", lit("N/A"))
      .withColumn("respattr", lit("N/A"))
      .withColumn("response_status", lit("N/A"))
      .withColumn("post_body", lit(null).cast("string"))
      .withColumn("post_body_raw", lit(null).cast("string"))
      .withColumn("content_hash", lit(null).cast("string"))
    (nodes, edges)
  }
}
