package graft.webgraph

/** Deterministic cookie-string parsing (reference semantics:
  * /root/reference/code/graph/storage_edges.py:65-95 for JS document.cookie,
  * /root/reference/code/graph/http_storage_edges.py:10-63 +
  * the vendored CPython BaseCookie for HTTP headers — SURVEY.md §2.7 F8/F9).
  *
  * Re-expressed, not ported: an RFC-6265-style attribute-pair scanner with
  * the reference's observable behavior (first pair = name/value, known
  * attributes folded, flag attributes boolean, unknown attributes ignored).
  */
object CookieParse {

  /** JS `document.cookie` GET payload: "a=1; b=2" → [(name, value)…]
    * (storage_edges.py:79-82 split-on-; then split-on-=; a pair without '='
    * yields value ""). */
  def jsGet(value: String): Seq[(String, String)] = {
    if (value == null || value.isEmpty) return Seq.empty
    value.split(";").toSeq.map(_.trim).filter(_.nonEmpty).map { c =>
      val i = c.indexOf('=')
      if (i < 0) (c, "") else (c.substring(0, i), c.substring(i + 1))
    }
  }

  /** JS `document.cookie` SET payload: "name=value; attr=v; Secure" →
    * single (name, value-with-attrs) pair (storage_edges.py:84-92: value
    * keeps the attribute tail appended after "; "). */
  def jsSet(value: String): Seq[(String, String)] = {
    if (value == null || value.isEmpty) return Seq.empty
    val parts = value.split(";", 2)
    val first = parts(0)
    val eq = first.indexOf('=')
    val name = if (eq < 0) first else first.substring(0, eq)
    val v =
      if (parts.length > 1)
        (if (eq < 0) "" else first.substring(eq + 1)) + "; " + parts(1)
      else if (eq < 0) "" else first.substring(eq + 1)
    Seq((name, v))
  }

  final case class HttpCookie(
      name: String, value: String, expires: Option[String],
      path: Option[String], domain: Option[String], max_age: Option[String],
      httponly: Boolean, secure: Boolean, samesite: Option[String])

  private val knownAttrs =
    Set("expires", "path", "domain", "max-age", "httponly", "secure",
      "samesite", "version", "comment")

  /** Set-Cookie header → cookies with attributes. Multiple cookies in one
    * header are split on commas that start a new `name=` pair (the
    * BaseCookie behavior for OpenWPM's newline-merged headers is
    * approximated by also splitting on '\n'). */
  def parseSetCookie(header: String): Seq[HttpCookie] = {
    if (header == null || header.isEmpty) return Seq.empty
    header.split("\n").toSeq.flatMap(parseOneSetCookie)
  }

  private def parseOneSetCookie(header: String): Option[HttpCookie] = {
    val parts = header.split(";").toSeq.map(_.trim).filter(_.nonEmpty)
    if (parts.isEmpty) return None
    val eq = parts.head.indexOf('=')
    if (eq <= 0) return None
    val name = parts.head.substring(0, eq).trim
    val value = parts.head.substring(eq + 1).trim
    var expires, path, domain, maxAge, samesite: Option[String] = None
    var httponly, secure = false
    parts.tail.foreach { p =>
      val i = p.indexOf('=')
      val (k, v) =
        if (i < 0) (p.toLowerCase, "") else (p.substring(0, i).trim.toLowerCase,
          p.substring(i + 1).trim)
      k match {
        case "expires"  => expires = Some(v)
        case "path"     => path = Some(v)
        case "domain"   => domain = Some(v)
        case "max-age"  => maxAge = Some(v)
        case "samesite" => samesite = Some(v)
        case "httponly" => httponly = true
        case "secure"   => secure = true
        case _          => // unknown attribute: ignored (BaseCookie raises
                           // and the reference swallows → cookie dropped;
                           // we keep the cookie and drop the attr — fix)
      }
    }
    Some(HttpCookie(name, value, expires, path, domain, maxAge, httponly,
      secure, samesite))
  }

  /** Cookie request header: "a=1; b=2" → [(name, value)…]. */
  def parseCookieHeader(header: String): Seq[(String, String)] =
    jsGet(header).filter(_._1.nonEmpty)

  /** OpenWPM header JSON `[["name","value"],…]` → values for one
    * (case-sensitive) header name. Shared by the native cookie
    * expressions ([[graft.ext.CookieExpressions]]); a structural scan, not
    * a full JSON parse — runs only on cookie-bearing edges. */
  // compiled once — headerValues runs 3× per cookie-bearing row on the
  // promoted native-expression hot path; per-call Pattern.compile would
  // dwarf the saved ScalaUDF overhead
  private val headerPairRe =
    "\\[\\s*\"((?:[^\"\\\\]|\\\\.)*)\"\\s*,\\s*\"((?:[^\"\\\\]|\\\\.)*)\"\\s*\\]".r

  def headerValues(headersJson: String, name: String): Seq[String] = {
    if (headersJson == null || headersJson.isEmpty) return Seq.empty
    headerPairRe.findAllMatchIn(headersJson).collect {
      case m if m.group(1) == name =>
        m.group(2).replace("\\\"", "\"").replace("\\\\", "\\")
          .replace("\\n", "\n")
    }.toSeq
  }

  /** attr JSON for a `get` cookie edge (http_storage_edges.py:30-36) —
    * escaping via [[graft.core.Json]] so quoted values survive the
    * round trip into get_json_object. */
  def getCookieJson(n: String, v: String): String = {
    val J = graft.core.Json
    s"""{"name":${J.str(n)},"value":${J.str(v)}}"""
  }

  /** attr JSON for a `set` cookie edge (all parsed RFC-6265 attributes). */
  def setCookieJson(c: HttpCookie): String = {
    val J = graft.core.Json
    val opt = (k: String, o: Option[String]) =>
      s""""$k":${o.map(J.str).getOrElse("null")}"""
    s"""{"name":${J.str(c.name)},"value":${J.str(c.value)},""" +
      s"""${opt("expires", c.expires)},${opt("path", c.path)},""" +
      s"""${opt("domain", c.domain)},${opt("max_age", c.max_age)},""" +
      s""""httponly":${c.httponly},"secure":${c.secure},""" +
      s"""${opt("samesite", c.samesite)}}"""
  }
}
