package graft

import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._

import QueryUtil._
import graft.features.{AdditionalFeatures, IndirectEdges}
import graft.webgraph.GraphAssembly

/** DuckDB-oracled coverage for the round-2 feature families: the
  * "additional" cookie / response stats (additional.py), the indirect-edge
  * counts + weights (dataflow.py:137-155,169-180), and the A1 node
  * consolidation — each over an events-derived OpenWPM-shaped table both
  * engines can build (the df1 trick: deterministic column synthesis from
  * the events parquet, then the REAL engine operator on the Spark side and
  * a hand-mirrored SQL on the DuckDB side). */
object QueriesFeatures {

  val reg: Seq[Entry] = Seq(

    // AF1: cookie-set attribute stats (additional.py:98-160) — name/value
    // sizes (with the 'none' zeroing), httponly count, cookie-domain ≠
    // site count, the "N/A"-substring row gate.
    ("af1_cookie_stats", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val e = t(dir, "events").select(
        (col("user_id") % 10).as("visit_id"),
        concat(lit("u"), col("user_id") % 20).as("src"),
        (col("user_id") % 20).as("um"),
        QueryUtil.jsonGet(col("props"), "k").cast("long").as("k"),
        col("event_type"))
      val cval = when(col("k") % 11 === 0, "xN/Ax")
        .when(col("k") % 5 === 0, "NONEsense")
        .otherwise(expr("repeat('v', CAST(k % 9 AS INT) + 1)"))
      val edges = e.where(col("event_type") =!= "error")
        .select(col("visit_id"), col("src"), col("um"),
          concat(lit("""{"name":""""), expr("repeat('n', CAST(k % 4 AS INT) + 1)"),
            lit("""","value":""""), cval, lit("\""),
            when(col("k") % 3 === 0, lit(""","httponly":true""")).otherwise(lit("")),
            when(col("k") % 4 === 0,
              concat(lit(""","domain":".site"""), col("k") % 6, lit(".com\"")))
              .otherwise(lit("")),
            lit("}")).as("attr"),
          when(col("event_type") === "view", "set").otherwise("set_js")
            .as("action"))
      val nodes = edges.select(col("visit_id"), col("src").as("name"),
        concat(lit("site"), col("um") % 3, lit(".com")).as("top_level_domain"))
        .distinct()
      AdditionalFeatures.cookieStats(edges.drop("um"), nodes)
    }, Some(
      s"""WITH e AS (SELECT user_id % 10 AS visit_id,
        |    'u' || (user_id % 20) AS src, (user_id % 20) AS um,
        |    CAST(json_extract_string(props,'$$.k') AS BIGINT) AS k
        |  FROM events WHERE event_type <> 'error'),
        |r AS (SELECT visit_id, src, um,
        |    CAST(k % 4 AS INT) + 1 AS size_name,
        |    CASE WHEN k % 5 = 0 THEN 0 ELSE CAST(k % 9 AS INT) + 1 END AS size_val,
        |    (k % 3 = 0) AS httponly,
        |    CASE WHEN k % 4 = 0 THEN 'site' || (k % 6) || '.com' END AS cdom
        |  FROM e WHERE k % 11 <> 0)
        |SELECT visit_id, src AS name,
        |  MAX(size_name) AS max_size_name, MAX(size_val) AS max_size_val,
        |  MIN(size_name) AS min_size_name, MIN(size_val) AS min_size_val,
        |  AVG(size_name) AS mean_size_name, AVG(size_val) AS mean_size_val,
        |  ${isumSql("CASE WHEN httponly THEN 1 ELSE 0 END")} AS num_httponly,
        |  ${isumSql(
        "CASE WHEN cdom IS NOT NULL AND cdom <> 'site' || (um % 3) || '.com' THEN 1 ELSE 0 END")} AS num_diff_domain
        |FROM r GROUP BY visit_id, src""".stripMargin)),

    // AF2: response clength stats (additional.py:60-96) — sentinel attr
    // gates, null-respattr passthrough (pandas NaN != "N/A"), zero-length
    // drop (python filter(None)), src=rec / dst=size naming.
    ("af2_response_stats", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val k = QueryUtil.jsonGet(col("props"), "k").cast("long")
      val edges = t(dir, "events").select(
        (col("user_id") % 10).as("visit_id"),
        concat(lit("u"), col("user_id") % 20).as("src"),
        concat(lit("h"), k % 15).as("dst"),
        when(k % 7 === 0, "N/A").when(k % 7 === 1, "CS")
          .otherwise(concat(lit("""{"clength":"""), (k % 13) * 10, lit("}")))
          .as("attr"),
        when(k % 5 === 0, "N/A").otherwise(lit(null).cast("string"))
          .as("respattr"))
      AdditionalFeatures.responseStats(edges)
    }, Some(
      """WITH e AS (SELECT user_id % 10 AS visit_id,
        |    'u' || (user_id % 20) AS src,
        |    'h' || (CAST(json_extract_string(props,'$.k') AS BIGINT) % 15) AS dst,
        |    CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
        |  FROM events),
        |v AS (SELECT visit_id, src, dst, (k % 13) * 10 AS cl FROM e
        |  WHERE k % 7 NOT IN (0, 1) AND k % 5 <> 0 AND (k % 13) * 10 <> 0),
        |s AS (SELECT visit_id, src AS name, MAX(cl) AS max_rec_response_length,
        |    MIN(cl) AS min_rec_response_length, AVG(cl) AS mean_rec_response_length
        |  FROM v GROUP BY visit_id, src),
        |d AS (SELECT visit_id, dst AS name, MAX(cl) AS max_size_response,
        |    MIN(cl) AS min_size_response, AVG(cl) AS mean_size_response
        |  FROM v GROUP BY visit_id, dst)
        |SELECT COALESCE(s.visit_id, d.visit_id) AS visit_id,
        |  COALESCE(s.name, d.name) AS name,
        |  max_rec_response_length, min_rec_response_length, mean_rec_response_length,
        |  max_size_response, min_size_response, mean_size_response
        |FROM s FULL OUTER JOIN d ON s.visit_id = d.visit_id AND s.name = d.name""".stripMargin)),

    // IF1: indirect set_get / set_modify edges (J7/J8) + the reference's
    // distinct-partner counts and weight stats (dataflow.py:137-155,
    // 169-180) — the real IndirectEdges operator on the Spark side (the
    // theta-join families are provably empty on this table), window+join
    // mirror in DuckDB.
    ("if1_indirect_counts", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val edges = t(dir, "events").select(
        (col("user_id") % 10).as("visit_id"),
        concat(lit("u"), col("user_id") % 20).as("src"),
        concat(lit("k"), QueryUtil.jsonGet(col("props"), "k").cast("long") % 8)
          .as("dst"),
        when(col("event_type") === "view", "get_js")
          .when(col("event_type") === "click", "get_storage_js")
          .when(col("event_type") === "signup", "set_js")
          .when(col("event_type") === "purchase", "set_storage_js")
          .otherwise("remove_storage_js").as("action"),
        lit(null).cast("string").as("attr"),
        lit("N/A").as("reqattr"),
        col("ts").cast("string").as("time_stamp"))
      // shared IR consumed by both join branches: scratchTable (tmp-parquet
      // round trip) instead of localCheckpoint — no retained blocks leak
      // into host sessions that never call releaseScratch
      val ind = QueryUtil.scratchTable(IndirectEdges.build(edges), "if1_ind")
      IndirectEdges.counts(ind)
        .join(IndirectEdges.weights(ind), Seq("visit_id", "name"), "full_outer")
        .select(col("visit_id"), col("name"),
          col("num_set_get_src"), col("num_set_mod_src"),
          col("num_set_get_dst"), col("num_set_mod_dst"),
          col("num_set_url_src"), col("num_get_url_dst"),
          coalesce(col("indirect_mean_out_weights"), lit(-1.0)).as("mean_out_w"),
          coalesce(col("indirect_max_out_weights"), lit(-1L)).as("max_out_w"),
          coalesce(col("indirect_mean_in_weights"), lit(-1.0)).as("mean_in_w"),
          coalesce(col("indirect_max_in_weights"), lit(-1L)).as("max_in_w"))
    }, Some(
      """WITH e AS (SELECT user_id % 10 AS visit_id,
        |    'u' || (user_id % 20) AS src,
        |    'k' || (CAST(json_extract_string(props,'$.k') AS BIGINT) % 8) AS dst,
        |    CASE event_type WHEN 'view' THEN 'get_js' WHEN 'click' THEN 'get_storage_js'
        |      WHEN 'signup' THEN 'set_js' WHEN 'purchase' THEN 'set_storage_js'
        |      ELSE 'remove_storage_js' END AS action, ts
        |  FROM events),
        |sg AS (SELECT DISTINCT s.visit_id, s.src AS a, g.src AS b, s.dst
        |  FROM (SELECT * FROM e WHERE action IN ('set_js','set_storage_js')) s
        |  JOIN (SELECT * FROM e WHERE action IN ('get_js','get_storage_js')) g
        |    ON s.visit_id = g.visit_id AND s.dst = g.dst),
        |sge AS (SELECT visit_id, a AS src, b AS dst, CAST(COUNT(*) AS BIGINT) AS attr,
        |    'set_get' AS type FROM sg GROUP BY visit_id, a, b),
        |rn AS (SELECT visit_id, src, dst,
        |    ROW_NUMBER() OVER (PARTITION BY visit_id, dst ORDER BY ts ASC, src ASC) AS rn
        |  FROM e WHERE action IN ('set_js','set_storage_js','remove_storage_js')),
        |sm AS (SELECT DISTINCT f.visit_id, f.src AS a, l.src AS b, f.dst
        |  FROM rn f JOIN rn l ON f.visit_id = l.visit_id AND f.dst = l.dst
        |  WHERE f.rn = 1 AND l.rn > 1),
        |sme AS (SELECT visit_id, a AS src, b AS dst, CAST(1 AS BIGINT) AS attr,
        |    'set_modify' AS type FROM sm),
        |ind AS (SELECT * FROM sge UNION ALL SELECT * FROM sme),
        |oc AS (SELECT visit_id, src AS name,
        |    CAST(SUM(CASE WHEN type = 'set_get' THEN 1 ELSE 0 END) AS BIGINT) AS num_set_get_src,
        |    CAST(SUM(CASE WHEN type = 'set_modify' THEN 1 ELSE 0 END) AS BIGINT) AS num_set_mod_src,
        |    AVG(attr) AS mean_out_w, MAX(attr) AS max_out_w
        |  FROM ind GROUP BY visit_id, src),
        |ic AS (SELECT visit_id, dst AS name,
        |    CAST(SUM(CASE WHEN type = 'set_get' THEN 1 ELSE 0 END) AS BIGINT) AS num_set_get_dst,
        |    CAST(SUM(CASE WHEN type = 'set_modify' THEN 1 ELSE 0 END) AS BIGINT) AS num_set_mod_dst,
        |    AVG(attr) AS mean_in_w, MAX(attr) AS max_in_w
        |  FROM ind GROUP BY visit_id, dst)
        |SELECT COALESCE(oc.visit_id, ic.visit_id) AS visit_id,
        |  COALESCE(oc.name, ic.name) AS name,
        |  COALESCE(num_set_get_src, 0) AS num_set_get_src,
        |  COALESCE(num_set_mod_src, 0) AS num_set_mod_src,
        |  COALESCE(num_set_get_dst, 0) AS num_set_get_dst,
        |  COALESCE(num_set_mod_dst, 0) AS num_set_mod_dst,
        |  CAST(0 AS BIGINT) AS num_set_url_src, CAST(0 AS BIGINT) AS num_get_url_dst,
        |  COALESCE(mean_out_w, -1.0) AS mean_out_w,
        |  COALESCE(max_out_w, -1) AS max_out_w,
        |  COALESCE(mean_in_w, -1.0) AS mean_in_w,
        |  COALESCE(max_in_w, -1) AS max_in_w
        |FROM oc FULL OUTER JOIN ic ON oc.visit_id = ic.visit_id AND oc.name = ic.name""".stripMargin)),

    // IF2: the FULL IndirectEdges.build table with every family NONZERO —
    // closes the J9/J10 oracle gap (if1's table provably yields no
    // theta-family edges): synthetic cookie-value strings 'valXZ' (len>3,
    // punctuation-free, so the reference's partial/b64/md5/sha1 predicate
    // branches reduce to raw containment — features/utils.py:283-368,
    // 471-486) embedded in 2-hop request URLs, mirrored in SQL by modular
    // equality of the embedded digit.
    ("if2_indirect_edges", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val k = QueryUtil.jsonGet(col("props"), "k").cast("long")
      val e0 = t(dir, "events").select((col("user_id") % 5).as("visit_id"),
        col("event_id").as("c"), k.as("k"))
      val edges = e0.select(
        col("visit_id"),
        when(col("k") % 4 === 0, concat(lit("s"), col("k") % 10))
          .when(col("k") % 4 === 1, concat(lit("g"), col("k") % 10))
          .when(col("k") % 4 === 2, concat(lit("u"), col("k") % 7))
          .otherwise(concat(lit("m"), col("c") % 250)).as("src"),
        when(col("k") % 4 <= 1, concat(lit("ck"), shiftright(col("k"), 2) % 6))
          .when(col("k") % 4 === 2, concat(lit("m"), col("c") % 250))
          .otherwise(concat(lit("http://t"), col("k") % 9,
            lit(".com/?q=val"), shiftright(col("k"), 2) % 6, lit("Z"))).as("dst"),
        when(col("k") % 4 === 0, "set_js").when(col("k") % 4 === 1, "get_js")
          .otherwise("N/A").as("action"),
        when(col("k") % 4 === 0, concat(lit("{\"value\":\"val"), shiftright(col("k"), 2) % 6,
          lit("Z\"}"))).otherwise(lit(null).cast("string")).as("attr"),
        when(col("k") % 4 === 2, concat(lit("[[\"Cookie\",\"t=val"),
            shiftright(col("k"), 2) % 6, lit("Z\"]]")))
          .when(col("k") % 4 === 3, lit("[[\"A\",\"x\"]]"))
          .otherwise(lit("N/A")).as("reqattr"),
        lpad(col("c").cast("string"), 10, "0").as("time_stamp"))
      IndirectEdges.build(edges)
    }, Some(
      """WITH e0 AS (SELECT user_id % 5 AS v, event_id AS c,
        |    CAST(json_extract_string(props,'$.k') AS BIGINT) AS k FROM events),
        |sa AS (SELECT v, 's' || (k%10) AS src, 'ck' || ((k//4)%6) AS dst,
        |    'val' || ((k//4)%6) || 'Z' AS cv, lpad(CAST(c AS VARCHAR),10,'0') AS ts
        |  FROM e0 WHERE k%4=0),
        |gb AS (SELECT v, 'g' || (k%10) AS src, 'ck' || ((k//4)%6) AS dst
        |  FROM e0 WHERE k%4=1),
        |h1 AS (SELECT v, 'u' || (k%7) AS src, 'm' || (c%250) AS mid,
        |    ((k//4)%6) AS xv FROM e0 WHERE k%4=2),
        |h2 AS (SELECT v, 'm' || (c%250) AS mid,
        |    'http://t' || (k%9) || '.com/?q=val' || ((k//4)%6) || 'Z' AS dst,
        |    ((k//4)%6) AS yv FROM e0 WHERE k%4=3),
        |sgp AS (SELECT DISTINCT a.v, a.src AS ssrc, b.src AS gsrc, a.dst
        |  FROM sa a JOIN gb b ON b.v = a.v AND b.dst = a.dst),
        |sge AS (SELECT v, ssrc AS src, gsrc AS dst,
        |    CAST(COUNT(*) AS BIGINT) AS attr, 'set_get' AS type
        |  FROM sgp GROUP BY v, ssrc, gsrc),
        |rk AS (SELECT v, src, dst, ROW_NUMBER() OVER (PARTITION BY v, dst
        |    ORDER BY ts ASC, src ASC) AS rn FROM sa),
        |smp AS (SELECT DISTINCT f.v, f.src AS fsrc, l.src AS lsrc, f.dst
        |  FROM rk f JOIN rk l ON l.v = f.v AND l.dst = f.dst
        |  WHERE f.rn = 1 AND l.rn > 1),
        |sme AS (SELECT v, fsrc AS src, lsrc AS dst,
        |    CAST(1 AS BIGINT) AS attr, 'set_modify' AS type FROM smp),
        |vs AS (SELECT v, cv, MIN(src) AS src FROM sa GROUP BY v, cv),
        |tg AS (SELECT v, mid AS url FROM h1
        |  UNION SELECT v, dst FROM h2),
        |su AS (SELECT s.v, s.src, t.url AS dst,
        |    CAST(COUNT(*) AS BIGINT) AS attr, 'set_url' AS type
        |  FROM vs s JOIN tg t ON t.v = s.v
        |  WHERE t.url LIKE '%' || s.cv || '%'
        |  GROUP BY s.v, s.src, t.url),
        |gu AS (SELECT c1.v, c1.src, c2.dst,
        |    CAST(COUNT(*) AS BIGINT) AS attr, 'get_url' AS type
        |  FROM h1 c1 JOIN h2 c2 ON c2.v = c1.v AND c2.mid = c1.mid
        |    AND c2.yv = c1.xv
        |  GROUP BY c1.v, c1.src, c2.dst)
        |SELECT v AS visit_id, src, dst, attr, type FROM sge
        |UNION ALL SELECT v, src, dst, attr, type FROM sme
        |UNION ALL SELECT v, src, dst, attr, type FROM su
        |UNION ALL SELECT v, src, dst, attr, type FROM gu""".stripMargin)),

    // WG3: A1 node consolidation (graph_builder.py:26-65) — type priority
    // resolution Script>Document>Element>Request, single-type passthrough
    // (Storage survives), attr resolved to the single distinct value else
    // the top_level_url-bearing one else "".
    ("wg3_consolidate", (s: SparkSession, dir: String) => {
      implicit val sp = s
      val k = QueryUtil.jsonGet(col("props"), "k").cast("long")
      val nodes = t(dir, "events").select(
        (col("user_id") % 10).as("visit_id"),
        concat(lit("n"), k % 25).as("name"),
        when(col("event_type") === "view", "Request")
          .when(col("event_type") === "click", "Script")
          .when(col("event_type") === "signup", "Document")
          .when(col("event_type") === "purchase", "Element")
          .otherwise("Storage").as("type"),
        when(k % 3 === 0,
          concat(lit("""{"top_level_url":"x"""), k % 5, lit("\"}")))
          .when(k % 3 === 1, concat(lit("plain"), k % 4))
          .otherwise(lit(null).cast("string")).as("attr"),
        concat(lit("http://site"), col("user_id") % 10, lit("/"))
          .as("top_level_url"),
        concat(lit("d"), col("user_id") % 10).as("domain"),
        lit(null).cast("string").as("setter"),
        lit(null).cast("string").as("setting_time_stamp"))
      GraphAssembly.consolidateNodes(nodes)
        .select(col("visit_id"), col("name"), col("type"), col("attr"),
          col("top_level_url"), col("domain"))
    }, Some(
      """WITH n AS (SELECT user_id % 10 AS visit_id,
        |    'n' || (CAST(json_extract_string(props,'$.k') AS BIGINT) % 25) AS name,
        |    CASE event_type WHEN 'view' THEN 'Request' WHEN 'click' THEN 'Script'
        |      WHEN 'signup' THEN 'Document' WHEN 'purchase' THEN 'Element'
        |      ELSE 'Storage' END AS type,
        |    CASE WHEN CAST(json_extract_string(props,'$.k') AS BIGINT) % 3 = 0
        |        THEN '{"top_level_url":"x' || (CAST(json_extract_string(props,'$.k') AS BIGINT) % 5) || '"}'
        |      WHEN CAST(json_extract_string(props,'$.k') AS BIGINT) % 3 = 1
        |        THEN 'plain' || (CAST(json_extract_string(props,'$.k') AS BIGINT) % 4)
        |      END AS attr,
        |    'http://site' || (user_id % 10) || '/' AS top_level_url,
        |    'd' || (user_id % 10) AS domain
        |  FROM events)
        |SELECT visit_id, name,
        |  CASE WHEN COUNT(DISTINCT type) <= 1 THEN MAX(type)
        |       WHEN MAX(CASE type WHEN 'Script' THEN 4 WHEN 'Document' THEN 3
        |                 WHEN 'Element' THEN 2 WHEN 'Request' THEN 1 ELSE 0 END) > 0
        |         THEN CASE MAX(CASE type WHEN 'Script' THEN 4 WHEN 'Document' THEN 3
        |                      WHEN 'Element' THEN 2 WHEN 'Request' THEN 1 ELSE 0 END)
        |              WHEN 4 THEN 'Script' WHEN 3 THEN 'Document'
        |              WHEN 2 THEN 'Element' WHEN 1 THEN 'Request' END
        |       ELSE 'Request' END AS type,
        |  CASE WHEN COUNT(DISTINCT attr) <= 1 THEN MAX(attr)
        |       ELSE COALESCE(MAX(CASE WHEN contains(attr, 'top_level_url') THEN attr END), '')
        |       END AS attr,
        |  MAX(top_level_url) AS top_level_url, MAX(domain) AS domain
        |FROM n GROUP BY visit_id, name""".stripMargin))
  )
}
