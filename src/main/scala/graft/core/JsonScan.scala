package graft.core

/** Single-pass structural JSON field/element extraction — the row-hot
  * kernel behind the native `json_get` / `json_array_get` expressions
  * (graft.ext.JsonExpressions).
  *
  * Why not builtin `get_json_object`: Spark's GetJsonObjectEvaluator
  * constructs a Jackson parser (and an InputStreamReader) PER ROW PER CALL —
  * profiled as the single largest CPU sink of the unified-graph composition
  * (wg7) and the attr-reading feature families, which read up to four fields
  * from the same small flat JSON per row. This scanner is allocation-light
  * (one output string) and runs inside whole-stage codegen.
  *
  * Semantics (mirrors `get_json_object` with path `$.name` / `$[idx]` on the
  * engine's own payloads — flat objects built by [[Json]], OpenWPM argument
  * arrays):
  *  - string value → unescaped content; number/bool → literal token text;
  *  - JSON `null`, missing key/index, or non-container top level → null;
  *  - object/array value → raw JSON substring (deviation: `get_json_object`
  *    re-serializes, so whitespace inside nested values is normalized there
  *    but preserved here — the engine's payloads carry none);
  *  - duplicate keys → first match (engine payloads never produce them);
  *  - malformed input → null (best-effort: the scan bails on any structural
  *    violation it encounters before the target).
  */
object JsonScan {

  private def skipWs(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
      s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    i
  }

  private def hasBackslash(s: String, from: Int, until: Int): Boolean = {
    var i = from
    while (i < until) {
      if (s.charAt(i) == '\\') return true
      i += 1
    }
    false
  }

  /** End index (exclusive) of the string literal starting at `from`
    * (which must point at the opening quote); -1 if unterminated. */
  private def stringEnd(s: String, from: Int): Int = {
    var i = from + 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') i += 2
      else if (c == '"') return i + 1
      else i += 1
    }
    -1
  }

  /** End index (exclusive) of the value starting at `from`; -1 if
    * malformed. Tracks container depth; strings are escape-aware. */
  private def valueEnd(s: String, from: Int): Int = {
    if (from >= s.length) return -1
    s.charAt(from) match {
      case '"' => stringEnd(s, from)
      case '{' | '[' =>
        var depth = 0
        var i = from
        while (i < s.length) {
          s.charAt(i) match {
            case '"' =>
              val e = stringEnd(s, i)
              if (e < 0) return -1
              i = e
            case '{' | '[' => depth += 1; i += 1
            case '}' | ']' =>
              depth -= 1; i += 1
              if (depth == 0) return i
            case _ => i += 1
          }
        }
        -1
      case _ => // scalar token: to the next structural delimiter
        var i = from
        while (i < s.length && !",}] \t\n\r".contains(s.charAt(i))) i += 1
        if (i == from) -1 else i
    }
  }

  /** Render the value spanning [from, end) with get_json_object semantics:
    * strings unescape, `null` → null, everything else is the raw text. */
  private def render(s: String, from: Int, end: Int): String = {
    if (s.charAt(from) == '"')
      graft.webgraph.CookieParse.unescapeJson(s.substring(from + 1, end - 1))
    else {
      val raw = s.substring(from, end)
      if (raw == "null") null else raw
    }
  }

  /** Value of top-level field `name` of a JSON object (path `$.name`). */
  def getField(json: String, name: String): String = {
    val span = fieldSpan(json, name)
    if (span < 0) null
    else render(json, (span >>> 32).toInt, span.toInt)
  }

  /** Like [[getField]] but ONLY when the field's value is itself a JSON
    * container (object/array): returns the raw span; null for any scalar.
    * This is dict-navigation semantics — `json.loads(s)["a"]["b"]` and
    * `get_json_object(s, "$.a.b")` both fail (→ empty/null) when `a` holds
    * a STRING, even one whose CONTENT parses as JSON. Chaining plain
    * [[getField]] would unescape such a string and happily keep scanning —
    * double-encoded payloads would decode where the reference (and the
    * builtin) return nothing. Use this as the non-terminal step of a
    * chained path. */
  def getFieldContainer(json: String, name: String): String = {
    val span = fieldSpan(json, name)
    if (span < 0) null
    else {
      val from = (span >>> 32).toInt
      val c = json.charAt(from)
      if (c == '{' || c == '[') json.substring(from, span.toInt) else null
    }
  }

  /** Span of field `name`'s value packed as `(from << 32) | end`
    * (end exclusive); -1 if missing/malformed — index-only so the hot
    * getField path allocates exactly one output string. */
  private def fieldSpan(json: String, name: String): Long = {
    if (json == null || name == null) return -1L
    var i = skipWs(json, 0)
    if (i >= json.length || json.charAt(i) != '{') return -1L
    i = skipWs(json, i + 1)
    if (i < json.length && json.charAt(i) == '}') return -1L
    while (i < json.length) {
      if (json.charAt(i) != '"') return -1L
      val keyEnd = stringEnd(json, i)
      if (keyEnd < 0) return -1L
      // raw-span compare; unescape only when the key span contains '\\'
      // (probe bounded to the key span — String.indexOf has no end bound
      // and would rescan to end-of-document on every key iteration)
      val rawLen = keyEnd - 1 - (i + 1)
      val hasEsc = hasBackslash(json, i + 1, keyEnd - 1)
      val matches =
        if (!hasEsc) rawLen == name.length && json.regionMatches(i + 1, name, 0, rawLen)
        else graft.webgraph.CookieParse.unescapeJson(
          json.substring(i + 1, keyEnd - 1)) == name
      i = skipWs(json, keyEnd)
      if (i >= json.length || json.charAt(i) != ':') return -1L
      i = skipWs(json, i + 1)
      val vEnd = valueEnd(json, i)
      if (vEnd < 0) return -1L
      if (matches) return (i.toLong << 32) | vEnd.toLong
      i = skipWs(json, vEnd)
      if (i >= json.length) return -1L
      json.charAt(i) match {
        case ',' => i = skipWs(json, i + 1)
        case _   => return -1L
      }
    }
    -1L
  }

  /** idx-th element (0-based) of a top-level JSON array (path `$[idx]`). */
  def getIndex(json: String, idx: Int): String = {
    if (json == null || idx < 0) return null
    var i = skipWs(json, 0)
    if (i >= json.length || json.charAt(i) != '[') return null
    i = skipWs(json, i + 1)
    if (i < json.length && json.charAt(i) == ']') return null
    var k = 0
    while (i < json.length) {
      val vEnd = valueEnd(json, i)
      if (vEnd < 0) return null
      if (k == idx) return render(json, i, vEnd)
      k += 1
      i = skipWs(json, vEnd)
      if (i >= json.length) return null
      json.charAt(i) match {
        case ',' => i = skipWs(json, i + 1)
        case ']' => return null
        case _   => return null
      }
    }
    null
  }
}
