package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import QueryUtil._
import graft.webgraph._

/** Graph-construction parity queries (SURVEY.md §2.3 J1-J6, §2.4 A1/A2,
  * §2.7 F7-F9/F13-F15/F19): the reference's OpenWPM→property-graph
  * assembly. wg4/wg5 run the REAL RequestGraph construction
  * over events-derived OpenWPM-shaped tables with a full DuckDB mirror:
  * redirect-chain assembly (J1: 3-way join + per-chain window with the
  * lead() header shift, A4/W3), completed-key anti join (J3/P7), key synth
  * (F13), and type promotion (F14); wg7/wg8 oracle the complete unified
  * node/edge composition the same way. Call stacks are empty in wg4 (the
  * stack-URL regex explode is not SQL-expressible; it is spec-pinned over
  * the crawl fixture in WebGraphSpec). */
object QueriesWebGraph {

  private def wgTables(s: SparkSession, dir: String) = {
    import org.apache.spark.sql.Column
    implicit val sp = s
    import s.implicits._
    val k = QueryUtil.jsonGet(col("props"), "k").cast("long")
    val u = t(dir, "events").select(
      (col("user_id") % 10).as("v"), col("event_id").as("c"), k.as("k"))
      .withColumn("url0", concat(lit("http://a"), col("k") % 20, lit("/p"), col("c") % 13))
      .withColumn("url1", concat(lit("http://b"), col("k") % 20, lit("/q"), col("c") % 13))
      .withColumn("url2", concat(lit("http://c"), col("k") % 20, lit("/s"), col("c") % 13))
      .withColumn("tlu", concat(lit("http://site"), col("v"), lit("/")))
    def ts(x: Column) = lpad(x.cast("string"), 10, "0")
    def hdr(i: Int): Column =
      concat(lit("[[\"A\",\"a" + i + "-"), col("k") % 3, lit("\"]]"))
    def reqRow(url: Column, h: Column, rt: Column, t0: Column) =
      u.select(col("v").as("visit_id"), col("c").as("request_id"),
        url.as("url"), h.as("headers"), col("tlu").as("top_level_url"),
        rt.as("resource_type"), t0.as("time_stamp"),
        lit(null).cast("string").as("post_body"),
        lit(null).cast("string").as("post_body_raw"))
    val requests =
      reqRow(col("url0"), hdr(0), lit("image"), ts(col("c") * 3))
        .unionByName(reqRow(col("url1"), hdr(1),
          when(col("k") % 7 === 0, "script")
            .when(col("k") % 7 === 1, "main_frame").otherwise("sub_frame"),
          ts(col("c") * 3 + 1)))
        .unionByName(reqRow(col("url2"), hdr(2), lit("other"),
          ts(col("c") * 3 + 2)).where(col("k") % 9 === 0))
        .as[webgraph.HttpRequest]
    val redirects = u.where(col("k") % 3 === 0).select(
        col("v").as("visit_id"), col("c").as("old_request_id"),
        col("url0").as("old_request_url"), col("url1").as("new_request_url"),
        (lit(301) + col("k") % 2).cast("int").as("response_status"),
        concat(lit("[[\"L\",\""), col("url1"), lit("\"]]")).as("headers"),
        ts(col("c") * 3).as("time_stamp"))
      .unionByName(u.where(col("k") % 9 === 0).select(
        col("v").as("visit_id"), col("c").as("old_request_id"),
        col("url1").as("old_request_url"), col("url2").as("new_request_url"),
        lit(302).as("response_status"),
        concat(lit("[[\"L2\",\""), col("url2"), lit("\"]]")).as("headers"),
        ts(col("c") * 3 + 1).as("time_stamp")))
      .as[webgraph.HttpRedirect]
    val responses = u.where(col("k") % 4 =!= 1).select(
        col("v").as("visit_id"), col("c").as("request_id"),
        when(col("k") % 9 === 0, col("url2")).otherwise(col("url1")).as("url"),
        concat(lit("[[\"C\",\"c"), col("k") % 5, lit("\"]]")).as("headers"),
        (lit(200) + col("k") % 4).cast("int").as("response_status"),
        ts(col("c") * 3 + 2).as("time_stamp"),
        concat(lit("h"), col("k") % 9).as("content_hash"))
      .as[webgraph.HttpResponse]
    (requests, responses, redirects, s.emptyDataset[webgraph.CallStack])
  }

  /** Shared DuckDB mirror of the events→OpenWPM derivation. */
  private val wgTablesSql =
    """e0 AS (SELECT user_id % 10 AS v, event_id AS c,
      |    CAST(json_extract_string(props,'$.k') AS BIGINT) AS k FROM events),
      |u AS (SELECT v, c, k,
      |    'http://a' || (k%20) || '/p' || (c%13) AS url0,
      |    'http://b' || (k%20) || '/q' || (c%13) AS url1,
      |    'http://c' || (k%20) || '/s' || (c%13) AS url2,
      |    'http://site' || v || '/' AS tlu FROM e0),
      |req AS (
      |  SELECT v, c AS request_id, url0 AS url,
      |    '[["A","a0-' || (k%3) || '"]]' AS headers, tlu,
      |    'image' AS rt, lpad(CAST(3*c AS VARCHAR), 10, '0') AS ts FROM u
      |  UNION ALL
      |  SELECT v, c, url1, '[["A","a1-' || (k%3) || '"]]', tlu,
      |    CASE WHEN k%7=0 THEN 'script' WHEN k%7=1 THEN 'main_frame'
      |         ELSE 'sub_frame' END,
      |    lpad(CAST(3*c+1 AS VARCHAR), 10, '0') FROM u
      |  UNION ALL
      |  SELECT v, c, url2, '[["A","a2-' || (k%3) || '"]]', tlu, 'other',
      |    lpad(CAST(3*c+2 AS VARCHAR), 10, '0') FROM u WHERE k%9=0),
      |red AS (
      |  SELECT v, c AS old_request_id, url0 AS old_request_url,
      |    url1 AS new_request_url, 301 + (k%2) AS status,
      |    '[["L","' || url1 || '"]]' AS headers FROM u WHERE k%3=0
      |  UNION ALL
      |  SELECT v, c, url1, url2, 302, '[["L2","' || url2 || '"]]'
      |  FROM u WHERE k%9=0),
      |resp AS (SELECT v, c AS request_id,
      |    CASE WHEN k%9=0 THEN url2 ELSE url1 END AS url,
      |    '[["C","c' || (k%5) || '"]]' AS headers, 200 + (k%4) AS status,
      |    'h' || (k%9) AS content_hash FROM u WHERE k%4 <> 1)""".stripMargin

  /** Events-derived OpenWPM tables for the FULL unified-graph composition
    * (wg7/wg8): requests/responses with cookie-bearing headers (J6/F9),
    * js calls in both localStorage and document.cookie flavours (F7/F8),
    * hosts crafted so every eTLD+1 is trivially mirrorable ('x.com').
    * Redirects/callstacks are empty here — those assembly paths are
    * independently oracled end-to-end by wg4 — so the composition oracle
    * isolates what ONLY the composition adds: the 4-family union, setter
    * attach (A2/J5), consolidation (A1), party flags (F15) and domains. */
  def wg7Tables(s: SparkSession, dir: String) = {
    import org.apache.spark.sql.Column
    implicit val sp = s
    import s.implicits._
    val k = QueryUtil.jsonGet(col("props"), "k").cast("long")
    val u = t(dir, "events").select(
      (col("user_id") % 10).as("v"), col("event_id").as("c"), k.as("k"))
      .withColumn("url",
        concat(lit("http://r"), col("k") % 20, lit(".com/p"), col("c") % 13))
      .withColumn("tlu", concat(lit("http://site"), col("v"), lit(".com/")))
      // k%5==0 → first-party document host (party flag 'first' reachable)
      .withColumn("doc", when(col("k") % 5 === 0,
          concat(lit("http://site"), col("v"), lit(".com/page")))
        .otherwise(concat(lit("http://d"), col("k") % 7, lit(".com/page"))))
      .withColumn("sjs",
        concat(lit("http://s"), col("k") % 10, lit(".com/a.js")))
    def ts(x: Column) = lpad(x.cast("string"), 10, "0")
    val requests = u.select(col("v").as("visit_id"), col("c").as("request_id"),
        col("url"),
        when(col("k") % 4 === 0, concat(lit("[[\"Cookie\",\"hc"),
            col("k") % 5, lit("=hv"), col("c") % 3, lit("\"]]")))
          .otherwise(concat(lit("[[\"A\",\"x"), col("k") % 3, lit("\"]]")))
          .as("headers"),
        col("tlu").as("top_level_url"),
        when(col("k") % 7 === 0, "script").when(col("k") % 7 === 1, "main_frame")
          .otherwise("other").as("resource_type"),
        ts(col("c") * 3).as("time_stamp"),
        lit(null).cast("string").as("post_body"),
        lit(null).cast("string").as("post_body_raw"))
      .as[webgraph.HttpRequest]
    val responses = u.where(col("k") % 4 =!= 1).select(
        col("v").as("visit_id"), col("c").as("request_id"), col("url"),
        when(col("k") % 5 === 0, concat(lit("[[\"Set-Cookie\",\"sc"),
            col("k") % 7, lit("=sw"), col("c") % 3, lit("\"]]")))
          .otherwise(concat(lit("[[\"B\",\"y"), col("k") % 4, lit("\"]]")))
          .as("headers"),
        (lit(200) + col("k") % 4).cast("int").as("response_status"),
        ts(col("c") * 3 + 2).as("time_stamp"),
        concat(lit("h"), col("k") % 9).as("content_hash"))
      .as[webgraph.HttpResponse]
    val js = u.where(col("k") % 2 === 0).select(
        col("v").as("visit_id"), col("sjs").as("script_url"),
        lit("").as("script_line"), lit("").as("script_loc_eval"),
        col("tlu").as("top_level_url"), col("doc").as("document_url"),
        when(col("k") % 6 === 0, "Storage.setItem")
          .when(col("k") % 6 === 2, "Storage.getItem")
          .otherwise("Storage.removeItem").as("symbol"),
        lit("").as("call_stack"), lit("call").as("operation"),
        when(col("k") % 6 === 0, concat(lit("[\"n"), col("k") % 5,
            lit("\",\"val"), col("c") % 4, lit("\"]")))
          .otherwise(concat(lit("[\"n"), col("k") % 5, lit("\"]")))
          .as("arguments"),
        lit("").as("attributes"), lit("").as("value"),
        ts(col("c") * 2).as("time_stamp"))
      .unionByName(u.where(col("k") % 2 === 1).select(
        col("v").as("visit_id"), lit("").as("script_url"),
        lit("").as("script_line"), lit("").as("script_loc_eval"),
        col("tlu").as("top_level_url"), col("doc").as("document_url"),
        lit("window.document.cookie").as("symbol"),
        concat(lit("fn@"), col("sjs"), lit(":1:2")).as("call_stack"),
        when(col("k") % 4 === 1, "set").otherwise("get").as("operation"),
        lit("").as("arguments"), lit("").as("attributes"),
        concat(lit("c"), col("k") % 5, lit("=v"), col("c") % 4).as("value"),
        ts(col("c") * 2 + 1).as("time_stamp")))
      .as[webgraph.JsCall]
    (requests, responses, js)
  }

  /** Shared DuckDB base for the wg7/wg8 mirrors. */
  private val wg7BaseSql =
    """e0 AS (SELECT user_id % 10 AS v, event_id AS c,
      |    CAST(json_extract_string(props,'$.k') AS BIGINT) AS k FROM events),
      |u AS (SELECT v, c, k,
      |    'http://r' || (k%20) || '.com/p' || (c%13) AS url,
      |    'r' || (k%20) || '.com' AS urlhost,
      |    'http://site' || v || '.com/' AS tlu,
      |    'site' || v || '.com' AS tld,
      |    CASE WHEN k%5=0 THEN 'site' || v || '.com'
      |         ELSE 'd' || (k%7) || '.com' END AS doch,
      |    'http://s' || (k%10) || '.com/a.js' AS sjs,
      |    CASE WHEN k%7=0 THEN 'script' WHEN k%7=1 THEN 'main_frame'
      |         ELSE 'other' END AS rt,
      |    lpad(CAST(3*c AS VARCHAR), 10, '0') AS rts,
      |    lpad(CAST(2*c AS VARCHAR), 10, '0') AS lsts,
      |    lpad(CAST(2*c+1 AS VARCHAR), 10, '0') AS ckts
      |  FROM e0)""".stripMargin

  val reg: Seq[Entry] = Seq(

    // WG7: the FULL unified-graph NODE table (GraphAssembly.unifiedGraph,
    // reference run.py:146-165 + graph_builder.py:26-68) over events-derived
    // OpenWPM tables: 4-family node union (requests F14, localStorage F7,
    // js cookies F8, HTTP cookies F9), eTLD+1 domains, latest-setter attach
    // (A2/J5 quirk), A1 consolidation (type priority + attr resolution),
    // party flags (F15) — all vs one DuckDB mirror.
    ("wg7_unified_nodes", (s: SparkSession, dir: String) => {
      implicit val sp = s
      import s.implicits._
      val (req, resp, js) = wg7Tables(s, dir)
      val (nodes, _) = GraphAssembly.unifiedGraph(req, resp,
        s.emptyDataset[webgraph.HttpRedirect],
        s.emptyDataset[webgraph.CallStack], js)
      nodes.select(col("visit_id"), col("name"), col("top_level_url"),
        col("type"), col("attr"), col("domain"), col("setter"),
        col("setting_time_stamp"), col("top_level_domain"), col("party"),
        col("graph_attr"))
    }, Some(
      s"""WITH $wg7BaseSql,
        |httpn AS (SELECT DISTINCT v, url AS name, tlu,
        |    CASE WHEN rt='script' THEN 'Script' WHEN rt='main_frame'
        |         THEN 'Document' ELSE 'Request' END AS type,
        |    '{"content_policy_type":"' || rt || '","top_level_url":"' || tlu
        |      || '"}' AS attr,
        |    urlhost AS domain FROM u),
        |lsn AS (SELECT DISTINCT v,
        |    'n' || (k%5) || '|$$$$|' || doch || '|$$$$|LS' AS name, tlu,
        |    'Storage' AS type, 'N/A' AS attr, doch AS domain
        |  FROM u WHERE k%2=0),
        |ckn AS (SELECT DISTINCT v, 'c' || (k%5) || '|$$$$|' || doch AS name,
        |    tlu, 'Storage' AS type, 'Cookie' AS attr, doch AS domain
        |  FROM u WHERE k%2=1),
        |hcn AS (SELECT DISTINCT v, name, tlu, 'Storage' AS type,
        |    '{"cookie_type": "HTTPCookie"}' AS attr, urlhost AS domain
        |  FROM (
        |    SELECT v, 'hc' || (k%5) || '|$$$$|' || urlhost AS name, tlu,
        |      urlhost FROM u WHERE k%4=0
        |    UNION ALL
        |    SELECT v, 'sc' || (k%7) || '|$$$$|' || urlhost, tlu, urlhost
        |    FROM u WHERE k%5=0 AND k%4<>1)),
        |alln AS (SELECT * FROM httpn UNION ALL SELECT * FROM lsn
        |  UNION ALL SELECT * FROM ckn UNION ALL SELECT * FROM hcn),
        |setsrc AS (
        |  SELECT v, 'c' || (k%5) || '|$$$$|' || doch AS name, sjs AS setter,
        |    ckts AS sts FROM u WHERE k%2=1 AND k%4=1
        |  UNION ALL
        |  SELECT v, 'sc' || (k%7) || '|$$$$|' || urlhost, url, rts
        |  FROM u WHERE k%5=0 AND k%4<>1),
        |setters AS (SELECT v, name, setter, sts AS setting_time_stamp FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY v, name
        |      ORDER BY sts DESC, setter ASC) AS rn FROM setsrc)
        |  WHERE rn = 1),
        |cons AS (SELECT v, name, MAX(tlu) AS top_level_url,
        |    COUNT(DISTINCT type) AS n_types, MAX(type) AS any_type,
        |    MAX(CASE type WHEN 'Script' THEN 4 WHEN 'Document' THEN 3
        |        WHEN 'Element' THEN 2 WHEN 'Request' THEN 1 ELSE 0 END)
        |      AS max_p,
        |    COUNT(DISTINCT attr) AS n_attrs, MAX(attr) AS any_attr,
        |    MAX(CASE WHEN attr LIKE '%top_level_url%' THEN attr END)
        |      AS tlu_attr,
        |    MAX(domain) AS domain
        |  FROM alln GROUP BY v, name),
        |resolved AS (SELECT c.v, c.name, c.top_level_url,
        |    CASE WHEN n_types <= 1 THEN any_type
        |         WHEN max_p = 4 THEN 'Script' WHEN max_p = 3 THEN 'Document'
        |         WHEN max_p = 2 THEN 'Element' WHEN max_p = 1 THEN 'Request'
        |         ELSE 'Request' END AS type,
        |    CASE WHEN n_attrs <= 1 THEN any_attr
        |         ELSE COALESCE(tlu_attr, '') END AS attr,
        |    c.domain, s.setter, s.setting_time_stamp,
        |    'site' || c.v || '.com' AS top_level_domain
        |  FROM cons c LEFT JOIN setters s ON s.v = c.v AND s.name = c.name)
        |SELECT v AS visit_id, name, top_level_url, type, attr, domain,
        |  setter, setting_time_stamp, top_level_domain,
        |  CASE WHEN type = 'Storage' AND domain IS NOT NULL
        |         AND top_level_domain IS NOT NULL
        |       THEN CASE WHEN domain = top_level_domain THEN 'first'
        |            ELSE 'third' END
        |       ELSE 'N/A' END AS party,
        |  'Node' AS graph_attr
        |FROM resolved""".stripMargin)),

    // WG8: the FULL unified-graph EDGE table: normal HTTP edges (J3), both
    // storage explodes (F7/F8) and the HTTP-cookie explode (F9/J6) unioned
    // into the 15-column model with sentinels, top_level_domain, graph_attr.
    ("wg8_unified_edges", (s: SparkSession, dir: String) => {
      implicit val sp = s
      import s.implicits._
      val (req, resp, js) = wg7Tables(s, dir)
      val (_, edges) = GraphAssembly.unifiedGraph(req, resp,
        s.emptyDataset[webgraph.HttpRedirect],
        s.emptyDataset[webgraph.CallStack], js)
      edges.select(col("visit_id"), col("src"), col("dst"),
        col("top_level_url"), col("attr"), col("reqattr"), col("respattr"),
        col("response_status"), col("time_stamp"), col("content_hash"),
        col("post_body"), col("post_body_raw"), col("action"),
        col("top_level_domain"), col("graph_attr"))
    }, Some(
      s"""WITH $wg7BaseSql,
        |alle AS (
        |  SELECT q.v, q.tlu AS src, q.url AS dst, q.tlu,
        |    CAST(NULL AS VARCHAR) AS attr,
        |    CASE WHEN q.k%4=0 THEN '[["Cookie","hc' || (q.k%5) || '=hv'
        |         || (q.c%3) || '"]]'
        |         ELSE '[["A","x' || (q.k%3) || '"]]' END AS reqattr,
        |    CASE WHEN q.k%5=0 THEN '[["Set-Cookie","sc' || (q.k%7) || '=sw'
        |         || (q.c%3) || '"]]'
        |         ELSE '[["B","y' || (q.k%4) || '"]]' END AS respattr,
        |    CAST(200 + q.k%4 AS VARCHAR) AS response_status,
        |    q.rts AS time_stamp, 'h' || (q.k%9) AS content_hash,
        |    CAST(NULL AS VARCHAR) AS post_body,
        |    CAST(NULL AS VARCHAR) AS post_body_raw, 'N/A' AS action
        |  FROM u q WHERE q.k%4 <> 1
        |  UNION ALL
        |  SELECT v, sjs, 'n' || (k%5) || '|$$$$|' || doch || '|$$$$|LS', tlu,
        |    CASE WHEN k%6=0 THEN '{"value":"val' || (c%4) || '"}' ELSE '' END,
        |    'N/A', 'N/A', 'N/A', lsts, NULL, NULL, NULL,
        |    CASE WHEN k%6=0 THEN 'set_storage_js' WHEN k%6=2
        |         THEN 'get_storage_js' ELSE 'remove_storage_js' END
        |  FROM u WHERE k%2=0
        |  UNION ALL
        |  SELECT v, sjs, 'c' || (k%5) || '|$$$$|' || doch, tlu,
        |    CASE WHEN k%4=1 THEN '{"value":""}'
        |         ELSE '{"value":"v' || (c%4) || '"}' END,
        |    'N/A', 'N/A', 'N/A', ckts, NULL, NULL, NULL,
        |    CASE WHEN k%4=1 THEN 'set_js' ELSE 'get_js' END
        |  FROM u WHERE k%2=1
        |  UNION ALL
        |  SELECT v, url, 'hc' || (k%5) || '|$$$$|' || urlhost, tlu,
        |    '{"name":"hc' || (k%5) || '","value":"hv' || (c%3) || '"}',
        |    'N/A', 'N/A', 'N/A', rts, NULL, NULL, NULL, 'get'
        |  FROM u WHERE k%4=0
        |  UNION ALL
        |  SELECT v, url, 'sc' || (k%7) || '|$$$$|' || urlhost, tlu,
        |    '{"name":"sc' || (k%7) || '","value":"sw' || (c%3)
        |      || '","expires":null,"path":null,"domain":null,'
        |      || '"max_age":null,"httponly":false,"secure":false,'
        |      || '"samesite":null}',
        |    'N/A', 'N/A', 'N/A', rts, NULL, NULL, NULL, 'set'
        |  FROM u WHERE k%5=0 AND k%4<>1)
        |SELECT v AS visit_id, src, dst, tlu AS top_level_url, attr, reqattr,
        |  respattr, response_status, time_stamp, content_hash, post_body,
        |  post_body_raw, action, 'site' || v || '.com' AS top_level_domain,
        |  'Edge' AS graph_attr
        |FROM alle""".stripMargin)),

    // (wg1/wg2 — the fixture-bound rows-only unified-graph entries — were
    // retired in round 4: the composition they smoke-checked is now FULLY
    // oracled by wg7/wg8 below, and their crawl-fixture goldens live on in
    // WebGraphSpec. Zero avoidable `no_oracle` registry rows remain.)

    // WG4: the REAL RequestGraph edge assembly end-to-end (J1 redirect
    // chains with the lead() header shift, J3 normal edges behind the
    // completed-key anti join, F13 key synth) vs a full SQL mirror.
    ("wg4_request_edges", (s: SparkSession, dir: String) => {
      val (req, resp, red, cs) = wgTables(s, dir)
      val (_, edges) = RequestGraph.build(req, resp, red, cs)
      edges.select(col("visit_id"), col("src"), col("dst"), col("reqattr"),
        col("respattr"), col("response_status"), col("time_stamp"),
        col("content_hash"))
    }, Some(
      s"""WITH $wgTablesSql,
        |x1 AS (SELECT r.v, r.old_request_id, r.old_request_url,
        |    r.new_request_url, r.headers AS respattr1, r.status AS red_status,
        |    q.headers AS reqattr1, q.tlu, q.ts AS src_ts
        |  FROM red r JOIN req q ON q.v = r.v AND q.request_id = r.old_request_id
        |    AND q.url = r.old_request_url),
        |x2 AS (SELECT x1.*, q2.headers AS reqattr2 FROM x1
        |  JOIN req q2 ON q2.v = x1.v AND q2.request_id = x1.old_request_id
        |    AND q2.url = x1.new_request_url),
        |x3 AS (SELECT x2.*, p.headers AS resp_final, p.status AS status_final
        |  FROM x2 LEFT JOIN resp p ON p.v = x2.v
        |    AND p.request_id = x2.old_request_id AND p.url = x2.new_request_url),
        |hops AS (SELECT *, ROW_NUMBER() OVER w AS rn,
        |    LEAD(respattr1) OVER w AS next_respattr,
        |    LEAD(red_status) OVER w AS next_status
        |  FROM x3 WINDOW w AS (PARTITION BY v, old_request_id
        |    ORDER BY src_ts ASC, new_request_url ASC)),
        |hop_e AS (SELECT v AS visit_id, old_request_url AS src,
        |    new_request_url AS dst, reqattr2 AS reqattr,
        |    COALESCE(next_respattr, resp_final) AS respattr,
        |    CAST(COALESCE(next_status, status_final) AS VARCHAR) AS response_status,
        |    src_ts AS time_stamp, 'N/A' AS content_hash FROM hops),
        |init_e AS (SELECT v AS visit_id, tlu AS src, old_request_url AS dst,
        |    reqattr1 AS reqattr, respattr1 AS respattr,
        |    CAST(red_status AS VARCHAR) AS response_status,
        |    src_ts AS time_stamp, 'N/A' AS content_hash FROM hops WHERE rn = 1),
        |completed AS (SELECT DISTINCT
        |    CAST(v AS VARCHAR) || '_' || CAST(old_request_id AS VARCHAR) AS key
        |  FROM x3),
        |norm_e AS (SELECT q.v AS visit_id, q.tlu AS src, q.url AS dst,
        |    q.headers AS reqattr, p.headers AS respattr,
        |    CAST(p.status AS VARCHAR) AS response_status, q.ts AS time_stamp,
        |    p.content_hash
        |  FROM req q JOIN resp p ON p.v = q.v AND p.request_id = q.request_id
        |  WHERE CAST(q.v AS VARCHAR) || '_' || CAST(q.request_id AS VARCHAR)
        |    NOT IN (SELECT key FROM completed))
        |SELECT * FROM init_e UNION ALL SELECT * FROM hop_e
        |UNION ALL SELECT * FROM norm_e""".stripMargin)),

    // WG6: the localStorage construction path (StorageGraph.localStorage):
    // F7 Storage.(get|set|remove)Item symbol regex → action, F2 cookie-key
    // concat name|$$|domain|$$|LS, arguments-JSON extraction, to_json attr
    // payload, and eTLD+1 over hosts whose suffix split is trivially
    // mirrorable ('dN.com' → 'dN.com').
    ("wg6_local_storage", (s: SparkSession, dir: String) => {
      implicit val sp = s
      import s.implicits._
      val k = QueryUtil.jsonGet(col("props"), "k").cast("long")
      val js = t(dir, "events").select(
        (col("user_id") % 10).as("visit_id"),
        concat(lit("http://s"), k % 10, lit(".com/a.js")).as("script_url"),
        lit("").as("script_line"), lit("").as("script_loc_eval"),
        concat(lit("http://site"), col("user_id") % 10, lit("/"))
          .as("top_level_url"),
        concat(lit("http://d"), k % 7, lit(".com/page")).as("document_url"),
        when(k % 3 === 0, "Storage.setItem")
          .when(k % 3 === 1, "Storage.getItem")
          .otherwise("Storage.removeItem").as("symbol"),
        lit("").as("call_stack"), lit("call").as("operation"),
        when(k % 3 === 0,
          concat(lit("""["n"""), k % 6, lit("""","val"""), k % 4, lit("\"]")))
          .otherwise(concat(lit("""["n"""), k % 6, lit("\"]"))).as("arguments"),
        lit("").as("attributes"), lit("").as("value"),
        lpad(col("event_id").cast("string"), 10, "0").as("time_stamp"))
        .as[webgraph.JsCall]
      val (_, edges) = StorageGraph.localStorage(js)
      edges
    }, Some(
      """WITH e0 AS (SELECT user_id % 10 AS v, event_id AS c,
        |    CAST(json_extract_string(props,'$.k') AS BIGINT) AS k FROM events)
        |SELECT v AS visit_id,
        |  'http://s' || (k%10) || '.com/a.js' AS src,
        |  'n' || (k%6) || '|$$|d' || (k%7) || '.com|$$|LS' AS dst,
        |  'http://site' || v || '/' AS top_level_url,
        |  CASE WHEN k%3 = 0 THEN 'set_storage_js' WHEN k%3 = 1
        |       THEN 'get_storage_js' ELSE 'remove_storage_js' END AS action,
        |  CASE WHEN k%3 = 0 THEN '{"value":"val' || (k%4) || '"}' ELSE '' END
        |    AS attr,
        |  lpad(CAST(c AS VARCHAR), 10, '0') AS time_stamp
        |FROM e0""".stripMargin)),

    // WG5: request nodes with F14 type promotion and the to_json attr
    // payload (deterministic struct key order, mirrored by string concat).
    ("wg5_request_nodes", (s: SparkSession, dir: String) => {
      val (req, _, _, _) = wgTables(s, dir)
      RequestGraph.requestNodes(req)
    }, Some(
      s"""WITH $wgTablesSql
        |SELECT DISTINCT v AS visit_id, url AS name, tlu AS top_level_url,
        |  CASE WHEN rt = 'script' THEN 'Script'
        |       WHEN rt = 'main_frame' THEN 'Document' ELSE 'Request' END AS type,
        |  '{"content_policy_type":"' || rt || '","top_level_url":"' || tlu
        |    || '"}' AS attr
        |FROM req""".stripMargin))
  )
}
