package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.webgraph._

/** Graph-construction parity on the hand-written OpenWPM-shaped fixture
  * (FIXTURES.md §3): redirect-chain assembly with header shift, call-stack
  * explosion, anti-join normal edges, element linkage, storage/cookie
  * explodes, HTTP cookie headers, latest-setter quirk, A1 consolidation. */
class WebGraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val req = FixtureCrawl.requests(spark)
  private lazy val resp = FixtureCrawl.responses(spark)
  private lazy val red = FixtureCrawl.redirects(spark)
  private lazy val cs = FixtureCrawl.callstacks(spark)
  private lazy val js = FixtureCrawl.jsCalls(spark)

  test("redirect chain: entry edge + per-hop edges with shifted responses") {
    val (edges, completed) = RequestGraph.redirectEdges(req, red, resp)
    val rows = edges.collect()
    val triples = rows.map(r => (r.getAs[String]("src"), r.getAs[String]("dst"),
      r.getAs[String]("response_status"))).toSet
    assert(triples === Set(
      // entry: top_level_url -> chain head, status of first 3xx
      ("http://site-a.example/", "http://r.example/start", "301"),
      // hop1 -> status of NEXT 3xx (302), final hop -> final response 200
      ("http://r.example/start", "http://r.example/hop1", "302"),
      ("http://r.example/hop1", "http://t.example/final", "200")))
    // final hop's respattr is the FINAL response headers
    val last = rows.find(_.getAs[String]("dst") == "http://t.example/final").get
    assert(last.getAs[String]("respattr").contains("Content-Type"))
    assert(completed.collect().map(_.getString(0)).toSet === Set("1_10"))
  }

  test("call-stack edges: CS hops bottom-up then terminal HTTP edge") {
    val (edges, _) = RequestGraph.csEdges(req, resp, cs)
    val rows = edges.collect()
    val hops = rows.filter(_.getAs[String]("reqattr") == "CS")
      .map(r => (r.getAs[String]("src"), r.getAs[String]("dst"))).toSet
    assert(hops === Set(
      ("http://site-a.example/boot.js", "http://helper.example/mid.js"),
      ("http://helper.example/mid.js", "http://tracker.example/core.js")))
    val terminal = rows.filter(_.getAs[String]("reqattr") != "CS")
    assert(terminal.length === 1)
    assert(terminal(0).getAs[String]("src") === "http://tracker.example/core.js")
    assert(terminal(0).getAs[String]("dst") === "http://cdn.example/pixel.gif")
    assert(terminal(0).getAs[String]("response_status") === "200")
  }

  test("normal edges exclude redirect/callstack keys (anti join)") {
    val (_, edges) = RequestGraph.build(req, resp, red, cs)
    val normal = edges.where(col("action") === "N/A" &&
      col("reqattr") =!= "CS" && col("src") === "http://site-a.example/")
    val dsts = normal.select("dst").collect().map(_.getString(0)).toSet
    // request 20 went through the call stack, 10 through redirects;
    // 30 (lib.js) and 40 (main frame) remain as normal edges — plus the
    // redirect entry edge shares src; filter it out by status
    assert(dsts.contains("http://static.example/lib.js"))
    assert(dsts.contains("http://site-a.example/"))
    assert(!dsts.contains("http://cdn.example/pixel.gif"))
  }

  test("request nodes promote types from content policy") {
    val nodes = RequestGraph.requestNodes(req)
    val types = nodes.collect()
      .map(r => r.getAs[String]("name") -> r.getAs[String]("type")).toMap
    assert(types("http://static.example/lib.js") === "Script")
    assert(types("http://site-a.example/") === "Document")
    assert(types("http://cdn.example/pixel.gif") === "Request")
  }

  test("html: element created with content-derived id, src linked to parent") {
    val (nodes, edges) = HtmlGraph.build(js)
    val created = edges.where(col("action") === "create").collect()
    assert(created.length === 1)
    val elemId = created(0).getAs[String]("dst")
    assert(elemId.startsWith("Element_"))
    val setsrc = edges.where(col("action") === "setsrc").collect()
    assert(setsrc.length === 1)
    assert(setsrc(0).getAs[String]("src") === elemId)
    assert(setsrc(0).getAs[String]("dst") === "http://cdn.example/pixel.gif")
    val elemNode = nodes.where(col("type") === "Element").collect()(0)
    assert(elemNode.getAs[String]("attr").contains("\"subtype\":\"\""))
    assert(elemNode.getAs[String]("attr").contains("tag777"))
  }

  test("html quirks: one node per createElement row; zero-src-set visits " +
    "contribute nothing (html_edges.py gates)") {
    import spark.implicits._
    def call(vid: Long, sym: String, args: String, attrs: String, op: String,
             value: String, ts: String) =
      JsCall(vid, "http://s.example/a.js", "1", "", "http://p.example/",
        "http://p.example/", sym, "", op, args, attrs, value, ts)
    val rows = Seq(
      // visit 1: TWO same-tick same-script same-args createElements
      // (distinct openwpm tags) + one src set — must yield TWO element
      // nodes (reference: one node per dataframe row)
      call(1L, "window.document.createElement", "[\"img\"]",
        """{"0":{"openwpm":"t1"}}""", "call", "", "ts1"),
      call(1L, "window.document.createElement", "[\"img\"]",
        """{"0":{"openwpm":"t2"}}""", "call", "", "ts1"),
      call(1L, "HTMLImageElement.Element.src", "",
        """{"0":{"openwpm":"t1"}}""", "set", "http://cdn.example/a.gif", "ts2"),
      // visit 2: createElement but NO Element.src set — the reference's
      // build_html_components returns nothing for this visit
      call(2L, "window.document.createElement", "[\"img\"]",
        """{"0":{"openwpm":"t3"}}""", "call", "", "ts1")
    ).toDS()
    val (nodes, edges) = HtmlGraph.build(rows)
    val elems = nodes.where(col("type") === "Element").collect()
    assert(elems.length === 2, "same-content createElement rows collapsed")
    assert(elems.map(_.getAs[String]("name")).distinct.length === 2)
    assert(nodes.where(col("visit_id") === 2L).count() === 0)
    assert(edges.where(col("visit_id") === 2L).count() === 0)
    // the src edge hangs off the t1 element specifically
    val setsrc = edges.where(col("action") === "setsrc").collect()
    assert(setsrc.length === 1)
  }

  test("localStorage: LS-suffixed keys, get/set actions") {
    val (nodes, edges) = StorageGraph.localStorage(js)
    val key = "theme|$$|site-a.example|$$|LS"
    assert(nodes.collect().map(_.getAs[String]("name")).toSet === Set(key))
    val acts = edges.collect().map(r =>
      r.getAs[String]("action") -> r.getAs[String]("dst")).toSet
    assert(acts === Set("set_storage_js" -> key, "get_storage_js" -> key))
  }

  test("js cookies: multi-cookie get explodes; set carries attrs json") {
    val (_, edges) = StorageGraph.jsCookies(js)
    val gets = edges.where(col("action") === "get_js").collect()
    assert(gets.map(_.getAs[String]("dst")).toSet === Set(
      "sid|$$|site-a.example", "theme|$$|site-a.example"))
    val sets = edges.where(col("action") === "set_js").collect()
    assert(sets.length === 2)
    assert(sets.forall(_.getAs[String]("dst") === "sid|$$|site-a.example"))
    assert(sets.exists(_.getAs[String]("attr").contains("first-val")))
  }

  test("http cookies: Cookie gets and Set-Cookie sets with attributes") {
    val (httpNodes, httpEdges) = RequestGraph.build(req, resp, red, cs)
    val (nodes, edges) = HttpCookieGraph.build(httpEdges, httpNodes)
    val byAction = edges.collect().groupBy(_.getAs[String]("action"))
    val gets = byAction.getOrElse("get", Array.empty)
    val sets = byAction.getOrElse("set", Array.empty)
    assert(gets.exists(_.getAs[String]("dst") === "uid|$$|cdn.example"))
    assert(sets.exists(_.getAs[String]("dst") === "track|$$|cdn.example"))
    val setAttr = sets(0).getAs[String]("attr")
    assert(setAttr.contains("\"secure\":true"))
    assert(setAttr.contains("\"samesite\":\"None\""))
    assert(nodes.collect().forall(_.getAs[String]("type") === "Storage"))
  }

  test("http cookies: prefilter is a superset of the combined-list scan " +
    "(response-side Cookie, request-side lowercase set-cookie)") {
    import spark.implicits._
    // rows whose ONLY cookie signal is on the side the old prefilter did
    // not check — the reference's combined MultiDict emits edges for both
    // (http_storage_edges.py:84-95), so the engine prefilter must pass them
    val httpEdges = Seq(
      (1L, "http://a.example/", "http://cdn.example/x",
        "[]", """[["Cookie","rc=1"]]""", "200", "ts1", "N/A"),
      (1L, "http://a.example/", "http://cdn.example/y",
        """[["set-cookie","lc=2"]]""", "[]", "200", "ts2", "N/A")
    ).toDF("visit_id", "src", "dst", "reqattr", "respattr",
      "response_status", "time_stamp", "action")
    val httpNodes = Seq(
      (1L, "http://cdn.example/x", "http://a.example/"),
      (1L, "http://cdn.example/y", "http://a.example/"))
      .toDF("visit_id", "name", "top_level_url")
    val (_, edges) = HttpCookieGraph.build(httpEdges, httpNodes)
    val byAction = edges.collect().groupBy(_.getAs[String]("action"))
    assert(byAction.getOrElse("get", Array.empty)
      .map(_.getAs[String]("dst")).toSet === Set("rc|$$|cdn.example"))
    assert(byAction.getOrElse("set", Array.empty)
      .map(_.getAs[String]("dst")).toSet === Set("lc|$$|cdn.example"))
  }

  test("cookie parse parity quirks: jsSet value drop, jsGet '=' gating, " +
    "Set-Cookie morsels, first-header-only, unescape") {
    import graft.webgraph.CookieParse
    // set WITHOUT attributes: the reference's get_cookie_name only assigns
    // `value` inside its len(cookie)>1 branch — the real value is dropped
    assert(CookieParse.jsSet("sid=abc") === Seq(("sid", "")))
    // set WITH attributes: value tail + "; " + attrs (reference concat,
    // incl. the preserved leading space of the attr tail)
    assert(CookieParse.jsSet("sid=abc; Path=/") === Seq(("sid", "abc;  Path=/")))
    // no '=' but attributes follow: IndexError path → no pair at all
    assert(CookieParse.jsSet("sid; Path=/") === Seq.empty)
    assert(CookieParse.jsSet("sid") === Seq(("sid", "")))
    // get: FULL split('='), value = segment between first and second '=',
    // '='-less fragments yield a 1-element pair → gated out; empty-name
    // ("=v") pairs survive
    assert(CookieParse.jsGet("a=b=c; flag; =v") === Seq(("a", "b"), ("", "v")))
    // HTTP Cookie header keeps the FULL tail (BaseCookie morsel value)
    assert(CookieParse.parseCookieHeader("a=b=c") === Seq(("a", "b=c")))
    // Set-Cookie: a non-reserved name=value token starts a NEW morsel
    val cs = CookieParse.parseSetCookie("a=1; Path=/; b=2; Secure")
    assert(cs.map(_.name) === Seq("a", "b"))
    assert(cs(0).path === Some("/") && !cs(0).secure)
    assert(cs(1).value === "2" && cs(1).secure)
    // single-pass unescape: escaped-backslash + n is NOT a newline
    assert(CookieParse.unescapeJson("""x\\ny""") === "x\\ny")
    assert(CookieParse.unescapeJson("""a\"bA""") === "a\"bA")
    // repeated headers: only the FIRST instance is visible (MultiDict)
    assert(CookieParse.firstHeaderValue("""[["H","1"],["H","2"]]""", "H")
      === Some("1"))
  }

  test("cookie parsers plan as native expressions (no ScalaUDF)") {
    // promotion check (VERDICT r2 #5): the HTTP-cookie construction —
    // header scan, cookie parse, attr-JSON build, eTLD+1 — adds no UDF.
    // Synthetic inputs keep upstream RequestGraph (whose call-stack explode
    // is the deliberate §2.9 UDTF showcase) out of the plan tree.
    import spark.implicits._
    // range-derived headers: non-foldable, so the optimizer can't evaluate
    // the pure expressions at plan time (which it otherwise would — itself
    // proof there is no UDF)
    val httpEdges = spark.range(1).select(
      lit(1L).as("visit_id"), lit("http://site-a.example/").as("src"),
      lit("http://cdn.example/x").as("dst"),
      concat(lit("[[\"Cookie\",\"uid="), col("id"), lit("\"]]")).as("reqattr"),
      concat(lit("[[\"Set-Cookie\",\"t="), col("id"), lit("; Secure\"]]"))
        .as("respattr"),
      lit("200").as("response_status"), lit("ts1").as("time_stamp"),
      lit("N/A").as("action"))
    val httpNodes = Seq((1L, "http://cdn.example/x", "http://site-a.example/"))
      .toDF("visit_id", "name", "top_level_url")
    val (_, edges) = HttpCookieGraph.build(httpEdges, httpNodes)
    val plan = edges.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), "HttpCookieGraph must plan UDF-free")
    assert(plan.contains("cookie_get_triples(") &&
      plan.contains("cookie_set_triples("))
    // etld1(literal url) constant-folds away — which only a non-UDF can
    assert(edges.count() === 2) // one get + one set survive end-to-end
    // localStorage path: etld1 over a non-local column plans natively —
    // range-derived again, since a LocalRelation is pre-evaluated wholesale
    val jsBig = spark.range(2).select(
      lit(1L).as("visit_id"), lit("http://s.example/a.js").as("script_url"),
      lit("1").as("script_line"), lit("").as("script_loc_eval"),
      lit("http://site-a.example/").as("top_level_url"),
      concat(lit("http://site"), col("id"), lit(".example/")).as("document_url"),
      lit("window.Storage.setItem").as("symbol"), lit("").as("call_stack"),
      lit("set").as("operation"), lit("""["k","v"]""").as("arguments"),
      lit("").as("attributes"), lit("v").as("value"),
      lit("ts").as("time_stamp")).as[graft.webgraph.JsCall]
    val (lsNodes, lsEdges) = StorageGraph.localStorage(jsBig)
    val lsPlan = lsNodes.queryExecution.executedPlan.toString
    assert(!lsPlan.contains("UDF") && lsPlan.contains("etld1("))
    assert(!lsEdges.queryExecution.executedPlan.toString.contains("UDF"))
    // expression ↔ kernel equivalence on adversarial payloads (quotes,
    // backslashes, multi-cookie headers, flag attrs, '=' in values).
    // MultiDict parity: only the FIRST Cookie header instance is parsed
    // (the second is ignored); a fragment without '=' yields no morsel;
    // values keep the FULL tail after the first '='
    graft.ext.GraftExtensions.register(spark)
    val hdr =
      """[["Cookie","a=1; b=x\"y; c; d=e=f"],["X","z"],["Cookie","zz=ignored"]]"""
    val gets = spark.sql(
      s"""SELECT explode(cookie_get_triples('${hdr.replace("\\", "\\\\").replace("'", "''")}', '')) AS t""")
      .select("t._1", "t._3").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(gets.keySet === Set("a", "b", "d"))
    assert(gets("b") === graft.webgraph.CookieParse.getCookieJson("b", "x\"y"))
    assert(gets("d").contains("\"value\":\"e=f\""))
    val sc = """[["Set-Cookie","t=1; Path=/; Secure; SameSite=None"]]"""
    val sets = spark.sql(
      s"SELECT explode(cookie_set_triples('', '$sc')) AS t").select("t._3")
      .collect().map(_.getString(0))
    assert(sets.length === 1 && sets(0).contains("\"secure\":true") &&
      sets(0).contains("\"samesite\":\"None\"") &&
      sets(0).contains("\"path\":\"/\""))
    // combined-list MultiDict parity (http_storage_edges.py:84-89): a
    // request-side Set-Cookie is still found by the set scan, the request
    // entry wins over a response-side repeat, and one malformed side
    // (the reference's json.loads exception) suppresses the WHOLE row
    val both = spark.sql(
      "SELECT cookie_set_triples('[[\"Set-Cookie\",\"rq=1\"]]'," +
        " '[[\"Set-Cookie\",\"rs=2\"]]') AS s," +
        " cookie_get_triples('', '[[\"Cookie\",\"cv=9\"]]') AS g," +
        " cookie_get_triples('N/A', '[[\"Cookie\",\"cv=9\"]]') AS m")
      .collect()(0)
    assert(both.getSeq[org.apache.spark.sql.Row](0)
      .map(_.getString(0)) === Seq("rq"))
    assert(both.getSeq[org.apache.spark.sql.Row](1)
      .map(_.getString(0)) === Seq("cv"))
    assert(both.getSeq[org.apache.spark.sql.Row](2).isEmpty)
    val js2 = spark.sql(
      "SELECT js_cookie_pairs('n=v; Max-Age=3; HttpOnly', 'set') AS p," +
        " js_cookie_pairs('a=1; b=2', 'get') AS g").collect()(0)
    val setPair = js2.getSeq[org.apache.spark.sql.Row](0)
    assert(setPair.length === 1 && setPair(0).getString(0) === "n" &&
      setPair(0).getString(1) ===
        graft.webgraph.CookieParse.jsSet("n=v; Max-Age=3; HttpOnly")(0)._2)
    assert(js2.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0)) ===
      Seq("a", "b"))
  }

  test("latest-setter quirk: the SECOND set of sid wins in parity mode") {
    val (_, storEdges) = StorageGraph.build(js)
    val setters = GraphAssembly.originalSetters(
      storEdges.select("visit_id", "src", "dst", "action", "time_stamp"))
    val sid = setters.where(col("name") === "sid|$$|site-a.example").collect()
    assert(sid.length === 1)
    assert(sid(0).getAs[String]("setter") === "http://helper.example/mid.js")
    assert(sid(0).getAs[String]("setting_time_stamp") === "2023-01-01T00:00:12")
    // intended-semantics mode: earliest wins
    val earliest = GraphAssembly.originalSetters(
      storEdges.select("visit_id", "src", "dst", "action", "time_stamp"),
      parityLatest = false)
      .where(col("name") === "sid|$$|site-a.example").collect()
    assert(earliest(0).getAs[String]("setter") === "http://tracker.example/core.js")
  }

  test("graph.csv round trip: re-ingested graph yields identical features") {
    // S4/S5 interchange parity (run_extraction.py:253): export the unified
    // graph as the 23-column graph.csv, re-ingest, and prove the feature
    // matrix is unchanged — not just the schema shape
    import graft.sources.GraphCsv
    val (nodes, edges) = GraphAssembly.unifiedGraph(req, resp, red, cs, js)
    val n0 = nodes.localCheckpoint(true); val e0 = edges.localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    GraphCsv.write(GraphCsv.unified(n0, e0), dir)
    val (n1, e1) = GraphCsv.split(GraphCsv.read(spark, dir),
      n0.columns.toSeq, e0.columns.toSeq)
    // row-level parity of the graph tables themselves
    assert(n1.count() === n0.count() && e1.count() === e0.count())
    assert(n1.exceptAll(n0).count() === 0 && n0.exceptAll(n1).count() === 0)
    // feature-matrix parity end-to-end
    val f0 = graft.features.FeatureExtraction.features(n0, e0)
    val f1 = graft.features.FeatureExtraction.features(n1, e1)
    assert(f1.count() === f0.count())
    val d = graft.robustness.Mutation.featureDiff(f0, f1).collect()(0)
    val changed = d.schema.fieldNames.filter(c => d.getAs[Long](c) != 0L)
    assert(changed.isEmpty, s"features drifted through csv: ${changed.mkString(",")}")
    graft.QueryUtil.releaseScratch(spark)
  }

  test("unified graph: consolidation resolves type by priority, flags party") {
    val (nodes, edges) = GraphAssembly.unifiedGraph(req, resp, red, cs, js)
    assert(nodes.groupBy("name").count().where(col("count") > 1).count() === 0,
      "consolidation must leave one row per node name")
    val byName = nodes.collect().map(r => r.getAs[String]("name") -> r).toMap
    // pixel.gif appears as Request node (HTTP + Element.src) — stays Request
    assert(byName("http://cdn.example/pixel.gif").getAs[String]("type") === "Request")
    // lib.js appears as Script (cpt) and as plain src of storage edges
    assert(byName("http://static.example/lib.js").getAs[String]("type") === "Script")
    // third-party storage node
    val track = byName("track|$$|cdn.example")
    assert(track.getAs[String]("party") === "third")
    assert(track.getAs[String]("type") === "Storage")
    assert(edges.where(col("graph_attr") =!= "Edge").count() === 0)
    assert(edges.count() > 10)
  }
}
