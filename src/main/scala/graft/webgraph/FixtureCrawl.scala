package graft.webgraph

import org.apache.spark.sql.{Dataset, SparkSession}

/** Hand-written OpenWPM-shaped crawl fixture (FIXTURES.md §3): one visit of
  * site-a.example exercising every graph-construction operator — a 3-hop
  * redirect chain (J1/G9), a scripted request with a 3-frame call stack
  * (J2/UDTF), plain request/response pairs (J3/P7), createElement +
  * Element.src (J4), localStorage get/set (F7), document.cookie set/get
  * with multi-cookie reads (F8), Set-Cookie/Cookie headers with attributes
  * (F9/J6), and two setters of one cookie at different timestamps
  * (latest-setter quirk §2.11.1).
  *
  * Timestamps are ISO-8601 strings (lexical order == chronological).
  */
object FixtureCrawl {

  private def hdr(pairs: (String, String)*): String =
    pairs.map { case (k, v) => s"""["$k","$v"]""" }.mkString("[", ",", "]")

  val V = 1L

  def requests(spark: SparkSession): Dataset[HttpRequest] = {
    import spark.implicits._
    Seq(
      // redirect chain: r.example/start -> r.example/hop1 -> t.example/final
      HttpRequest(V, 10, "http://r.example/start", hdr("Accept" -> "*/*"),
        "http://site-a.example/", "sub_frame", "2023-01-01T00:00:01", null, null),
      HttpRequest(V, 10, "http://r.example/hop1", hdr("Accept" -> "*/*"),
        "http://site-a.example/", "sub_frame", "2023-01-01T00:00:02", null, null),
      HttpRequest(V, 10, "http://t.example/final", hdr("Accept" -> "*/*"),
        "http://site-a.example/", "sub_frame", "2023-01-01T00:00:03", null, null),
      // scripted request with call stack
      HttpRequest(V, 20, "http://cdn.example/pixel.gif",
        hdr("Accept" -> "image/*", "Cookie" -> "uid=abc123"),
        "http://site-a.example/", "image", "2023-01-01T00:00:04", null, null),
      // plain script request (normal edge, type promotion -> Script)
      HttpRequest(V, 30, "http://static.example/lib.js", hdr("Accept" -> "*/*"),
        "http://site-a.example/", "script", "2023-01-01T00:00:05", null, null),
      // main frame (type promotion -> Document)
      HttpRequest(V, 40, "http://site-a.example/", hdr("Accept" -> "text/html"),
        "http://site-a.example/", "main_frame", "2023-01-01T00:00:00", null, null)
    ).toDS()
  }

  def responses(spark: SparkSession): Dataset[HttpResponse] = {
    import spark.implicits._
    Seq(
      HttpResponse(V, 10, "http://t.example/final",
        hdr("Content-Type" -> "text/html", "Content-Length" -> "512"),
        200, "2023-01-01T00:00:03", "hashF"),
      HttpResponse(V, 20, "http://cdn.example/pixel.gif",
        hdr("Content-Type" -> "image/gif",
          "Set-Cookie" -> "track=xyz; Path=/; Secure; SameSite=None"),
        200, "2023-01-01T00:00:04", "hashP"),
      HttpResponse(V, 30, "http://static.example/lib.js",
        hdr("Content-Type" -> "application/javascript"),
        200, "2023-01-01T00:00:05", "hashJ"),
      HttpResponse(V, 40, "http://site-a.example/",
        hdr("Content-Type" -> "text/html"),
        200, "2023-01-01T00:00:00", "hashM")
    ).toDS()
  }

  def redirects(spark: SparkSession): Dataset[HttpRedirect] = {
    import spark.implicits._
    Seq(
      HttpRedirect(V, 10, "http://r.example/start", "http://r.example/hop1",
        301, hdr("Location" -> "http://r.example/hop1"), "2023-01-01T00:00:01"),
      HttpRedirect(V, 10, "http://r.example/hop1", "http://t.example/final",
        302, hdr("Location" -> "http://t.example/final"), "2023-01-01T00:00:02")
    ).toDS()
  }

  def callstacks(spark: SparkSession): Dataset[CallStack] = {
    import spark.implicits._
    val cs = Seq(
      "track@http://tracker.example/core.js:12:3",
      "mid@http://helper.example/mid.js:40:1",
      "boot@http://site-a.example/boot.js:5:9").mkString("\n")
    Seq(CallStack(V, 20, cs)).toDS()
  }

  /** Content store rows (LevelDB equivalent): hashJ is the lib.js Script
    * body — contains `function` AND a canvas-fingerprinting keyword
    * (toDataURL), so descendants of lib.js get all three
    * ascendant_script_* features; the rest are non-script bodies. */
  def contentBodies(spark: SparkSession): Dataset[ContentBody] = {
    import spark.implicits._
    Seq(
      ContentBody("hashJ",
        "function boot(){var c=document.createElement('canvas');" +
          "return c.toDataURL();}"),
      ContentBody("hashM", "<html><body>main</body></html>"),
      ContentBody("hashP", "GIF89a-binary-ish"),
      ContentBody("hashF", "<html>final hop</html>")
    ).toDS()
  }

  def jsCalls(spark: SparkSession): Dataset[JsCall] = {
    import spark.implicits._
    val csSet = "setC@http://tracker.example/core.js:77:1;" // frame "fn@url:line:col"
    Seq(
      // createElement + Element.src
      JsCall(V, "http://static.example/lib.js", "10", "",
        "http://site-a.example/", "http://site-a.example/",
        "window.document.createElement", "", "call", "[\"img\"]",
        """{"0":{"openwpm":"tag777"}}""", "", "2023-01-01T00:00:06"),
      JsCall(V, "http://static.example/lib.js", "11", "",
        "http://site-a.example/", "http://site-a.example/",
        "HTMLImageElement.Element.src", "", "set", "",
        """{"0":{"openwpm":"tag777"}}""", "http://cdn.example/pixel.gif",
        "2023-01-01T00:00:07"),
      // localStorage set + get
      JsCall(V, "http://static.example/lib.js", "20", "",
        "http://site-a.example/", "http://site-a.example/",
        "Storage.setItem", "", "call", "[\"theme\",\"dark\"]", "", "",
        "2023-01-01T00:00:08"),
      JsCall(V, "http://static.example/lib.js", "21", "",
        "http://site-a.example/", "http://site-a.example/",
        "Storage.getItem", "", "call", "[\"theme\"]", "", "",
        "2023-01-01T00:00:09"),
      // document.cookie: two setters of the same cookie (latest-setter
      // quirk) + a multi-cookie get
      JsCall(V, "http://tracker.example/core.js", "30", "",
        "http://site-a.example/", "http://site-a.example/",
        "window.document.cookie",
        "setC@http://tracker.example/core.js:77:1", "set", "", "",
        "sid=first-val; Path=/", "2023-01-01T00:00:10"),
      JsCall(V, "http://helper.example/mid.js", "31", "",
        "http://site-a.example/", "http://site-a.example/",
        "window.document.cookie",
        "setC2@http://helper.example/mid.js:5:2", "set", "", "",
        "sid=second-val; Path=/", "2023-01-01T00:00:12"),
      JsCall(V, "http://tracker.example/core.js", "32", "",
        "http://site-a.example/", "http://site-a.example/",
        "window.document.cookie",
        "getC@http://tracker.example/core.js:80:1", "get", "", "",
        "sid=second-val; theme=dark", "2023-01-01T00:00:13")
    ).toDS()
  }
}
