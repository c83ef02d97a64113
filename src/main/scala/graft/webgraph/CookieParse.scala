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
    * (storage_edges.py:79-82 split-on-; then FULL split-on-=, then
    * process_cookie_call_stack:140 gates on `len(pair) > 1`):
    *  - a fragment without '=' yields a 1-element pair → NO node/edge
    *    (dropped here);
    *  - the value is `pair[1]` — the segment between the FIRST and SECOND
    *    '=' only ("a=b=c" → value "b", not "b=c");
    *  - an empty name ("=v" → ["", "v"]) IS emitted. */
  def jsGet(value: String): Seq[(String, String)] = {
    if (value == null || value.isEmpty) return Seq.empty
    value.split(";").toSeq.map(_.trim).flatMap { c =>
      val parts = c.split("=", -1)
      if (parts.length < 2) None else Some((parts(0), parts(1)))
    }
  }

  /** JS `document.cookie` SET payload (storage_edges.py:84-92, exact
    * branch parity):
    *  - "name=value; attrs" → (name, value + "; " + attrs) — attrs folded
    *    into the value;
    *  - "name=value" with NO attributes → (name, "") — the reference only
    *    assigns `value` inside the len(cookie)>1 branch, so the real value
    *    is DROPPED (kept quirk);
    *  - "name; attrs" (no '=' but attributes) → nothing — the reference's
    *    cookie[0].split('=',1)[1] raises IndexError and the append never
    *    runs;
    *  - bare "name" → (name, ""). */
  def jsSet(value: String): Seq[(String, String)] = {
    if (value == null || value.isEmpty) return Seq.empty
    val parts = value.split(";", 2)
    val first = parts(0)
    val eq = first.indexOf('=')
    if (parts.length > 1) {
      if (eq < 0) Seq.empty
      else Seq((first.substring(0, eq), first.substring(eq + 1) + "; " + parts(1)))
    } else {
      Seq((if (eq < 0) first else first.substring(0, eq), ""))
    }
  }

  final case class HttpCookie(
      name: String, value: String, expires: Option[String],
      path: Option[String], domain: Option[String], max_age: Option[String],
      httponly: Boolean, secure: Boolean, samesite: Option[String])

  private val knownAttrs =
    Set("expires", "path", "domain", "max-age", "httponly", "secure",
      "samesite", "version", "comment")

  /** Set-Cookie header → cookies with attributes, BaseCookie morsel
    * semantics (http_storage_edges.py:10-39): a ';'-separated token whose
    * key is NOT a reserved attribute but carries '=' starts a NEW cookie
    * morsel ("a=1; b=2" yields cookies a AND b, like CPython's
    * BaseCookie), reserved attributes attach to the current morsel, and
    * unknown flag tokens are ignored. OpenWPM's newline-merged headers
    * additionally split on '\n'. (Approximation kept: BaseCookie's
    * strict legal-character set and its comma-separator legacy are not
    * reproduced — a parse error there voids the whole header, here only
    * the token.) */
  def parseSetCookie(header: String): Seq[HttpCookie] = {
    if (header == null || header.isEmpty) return Seq.empty
    header.split("\n").toSeq.flatMap(parseMorsels)
  }

  private val reservedAttrs =
    Set("expires", "path", "domain", "max-age", "samesite", "httponly",
      "secure", "version", "comment")

  private final class MorselBuilder(val name: String, val value: String) {
    var expires, path, domain, maxAge, samesite: Option[String] = None
    var httponly, secure = false
    def build: HttpCookie = HttpCookie(name, value, expires, path, domain,
      maxAge, httponly, secure, samesite)
  }

  private def parseMorsels(header: String): Seq[HttpCookie] = {
    val parts = header.split(";").toSeq.map(_.trim).filter(_.nonEmpty)
    val out = Seq.newBuilder[HttpCookie]
    var cur: MorselBuilder = null
    parts.foreach { p =>
      val i = p.indexOf('=')
      val key = (if (i < 0) p else p.substring(0, i).trim).toLowerCase
      if (reservedAttrs.contains(key)) {
        val v = if (i < 0) "" else p.substring(i + 1).trim
        if (cur != null) key match {
          case "expires"  => cur.expires = Some(v)
          case "path"     => cur.path = Some(v)
          case "domain"   => cur.domain = Some(v)
          case "max-age"  => cur.maxAge = Some(v)
          case "samesite" => cur.samesite = Some(v)
          case "httponly" => cur.httponly = true
          case "secure"   => cur.secure = true
          case _          => () // version/comment: parsed, not stored
        }
      } else if (i > 0) {
        // non-reserved name=value: a NEW cookie morsel
        if (cur != null) out += cur.build
        cur = new MorselBuilder(p.substring(0, i).trim,
          p.substring(i + 1).trim)
      } // non-reserved flag token: ignored
    }
    if (cur != null) out += cur.build
    out.result()
  }

  /** Cookie request header: "a=1; b=2" → [(name, value)…] — BaseCookie
    * morsel semantics (http_storage_edges.py:42-63), NOT the js-get split:
    * value is the FULL tail after the first '=' ("a=b=c" → "b=c"), and a
    * fragment without '=' or with an empty name yields no morsel. */
  def parseCookieHeader(header: String): Seq[(String, String)] = {
    if (header == null || header.isEmpty) return Seq.empty
    header.split(";").toSeq.map(_.trim).flatMap { c =>
      val i = c.indexOf('=')
      if (i <= 0) None else Some((c.substring(0, i).trim, c.substring(i + 1)))
    }
  }

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
      case m if m.group(1) == name => unescapeJson(m.group(2))
    }.toSeq
  }

  /** FIRST value of a (possibly repeated) header — the reference loads
    * headers into a multidict.MultiDict and indexes it
    * (http_storage_edges.py:90-103), which returns only the first instance
    * of a repeated name; later Cookie/Set-Cookie instances are IGNORED. */
  def firstHeaderValue(headersJson: String, name: String): Option[String] = {
    if (headersJson == null || headersJson.isEmpty) return None
    headerPairRe.findAllMatchIn(headersJson).collectFirst {
      case m if m.group(1) == name => unescapeJson(m.group(2))
    }
  }

  /** FIRST value of a header across the CONCATENATION of the request and
    * response header lists — the reference builds ONE MultiDict over
    * reqattr+respattr combined (http_storage_edges.py:84-89), so a Cookie
    * header in respattr (or Set-Cookie in reqattr) is still found; request
    * entries win ties because they precede response entries in the
    * combined list. Exception parity: the reference `json.loads`es BOTH
    * non-null sides before any lookup, so one malformed side (the "N/A" /
    * "CS" string sentinels) throws and the whole row yields NO cookies even
    * if the other side is cookie-bearing — mirrored here by the
    * starts-with-'[' gate (null/empty = the reference's pd.isna skip).
    * (Deviation kept: beyond that gate this is a lenient structural scan,
    * not a strict JSON parse — a string that starts with '[' but is
    * otherwise malformed yields its scannable pairs instead of an
    * exception.) */
  def firstHeaderValueIn(reqJson: String, respJson: String,
                         name: String): Option[String] = {
    def malformed(h: String) =
      h != null && h.nonEmpty && !h.trim.startsWith("[")
    if (malformed(reqJson) || malformed(respJson)) None
    else firstHeaderValue(reqJson, name).orElse(firstHeaderValue(respJson, name))
  }

  /** Single-pass JSON string-escape decoder (the former chained
    * `.replace`s corrupted "\\\\n" — escaped backslash + n — into a
    * newline; json.loads, which the reference uses, does not). */
  private[graft] def unescapeJson(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"'  => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '/'  => sb.append('/'); i += 2
          case 'n'  => sb.append('\n'); i += 2
          case 't'  => sb.append('\t'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case 'b'  => sb.append('\b'); i += 2
          case 'f'  => sb.append('\f'); i += 2
          case 'u' if i + 6 <= s.length =>
            try {
              sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
              i += 6
            } catch {
              case _: NumberFormatException => sb.append(c); i += 1
            }
          case _ => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
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
