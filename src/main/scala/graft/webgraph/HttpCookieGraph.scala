package graft.webgraph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.norm.Etld1

/** HTTP-header cookie graph construction (reference:
  * /root/reference/code/graph/http_storage_edges.py — SURVEY.md §2.3 J6,
  * §2.7 F9): request edges whose headers carry Cookie / Set-Cookie are
  * exploded into per-cookie edges from the requested URL to the cookie-key
  * node.
  *
  * Headers are OpenWPM's JSON list of [name, value] pairs; cookie payloads
  * parse via [[CookieParse]] (re-expressed RFC-6265-style scanner, not the
  * vendored CPython module).
  */
object HttpCookieGraph {

  private val etld1 = udf((u: String) => Etld1.ofUrl(u))

  /** header JSON → values for one (case-sensitive) header name. */
  private val headerValues = udf { (headersJson: String, name: String) =>
    if (headersJson == null) Seq.empty[String]
    else {
      // parse [["k","v"],...] without a JSON library dependency: use the
      // same from_json path as SQL via a tiny recursive-descent-free trick
      // is overkill — Spark's get_json_object can't filter pairs, so scan
      // here (runs only on cookie-bearing edges).
      val re = "\\[\\s*\"((?:[^\"\\\\]|\\\\.)*)\"\\s*,\\s*\"((?:[^\"\\\\]|\\\\.)*)\"\\s*\\]".r
      re.findAllMatchIn(headersJson).collect {
        case m if m.group(1) == name =>
          m.group(2).replace("\\\"", "\"").replace("\\\\", "\\")
            .replace("\\n", "\n")
      }.toSeq
    }
  }

  /** Cookie edges from HTTP request edges.
    * @param httpEdges  output of [[RequestGraph.build]] (edges)
    * @param httpNodes  output of [[RequestGraph.requestNodes]]
    * @return (cookieNodes, cookieEdges) */
  def build(httpEdges: DataFrame, httpNodes: DataFrame): (DataFrame, DataFrame) = {
    val bearing = httpEdges.where(
      col("respattr").contains("Set-Cookie") ||
        col("respattr").contains("set-cookie") ||
        col("reqattr").contains("Cookie"))

    // attr JSON built with full string escaping (graft.core.Json) — a
    // quote/backslash in a cookie value must survive the round trip into
    // get_json_object (IndirectEdges reads $.value back for set_url edges)
    val J = graft.core.Json
    val getC = udf((vs: Seq[String]) =>
      vs.flatMap(CookieParse.parseCookieHeader).map { case (n, v) =>
        (n, "get", s"""{"name":${J.str(n)},"value":${J.str(v)}}""")
      })
    val setC = udf((vs: Seq[String]) =>
      vs.flatMap(CookieParse.parseSetCookie).map { c =>
        val opt = (k: String, o: Option[String]) =>
          s""""$k":${o.map(J.str).getOrElse("null")}"""
        val json = s"""{"name":${J.str(c.name)},"value":${J.str(c.value)},""" +
          s"""${opt("expires", c.expires)},${opt("path", c.path)},""" +
          s"""${opt("domain", c.domain)},${opt("max_age", c.max_age)},""" +
          s""""httponly":${c.httponly},"secure":${c.secure},""" +
          s"""${opt("samesite", c.samesite)}}"""
        (c.name, "set", json)
      })

    val detailed = bearing
      .withColumn("gets", getC(headerValues(col("reqattr"), lit("Cookie"))))
      .withColumn("sets", setC(concat(
        headerValues(col("respattr"), lit("Set-Cookie")),
        headerValues(col("respattr"), lit("set-cookie")))))
      .withColumn("d", explode(concat(col("gets"), col("sets"))))
      .select(col("visit_id"), col("dst").as("req_url"),
        col("d._1").as("cname"), col("d._2").as("action"),
        col("d._3").as("attr"), col("time_stamp"))

    // J6: attach top_level_url from the request node of the requested url
    val nodeTlu = httpNodes
      .select(col("visit_id"), col("name").as("req_url"),
        col("top_level_url"))
      .dropDuplicates("visit_id", "req_url")
    val withTlu = detailed.join(nodeTlu, Seq("visit_id", "req_url"))
      .withColumn("domain", etld1(col("req_url")))
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
