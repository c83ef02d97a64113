package graft.core

/** Minimal JSON string encoding for the attr payloads the construction
  * layer builds by hand (cookie name/value/attribute JSON). The reference
  * uses python json.dumps; naive string interpolation breaks on quotes /
  * backslashes / control characters in cookie values and silently corrupts
  * every downstream get_json_object read (the set_url indirect edges would
  * vanish). */
object Json extends Serializable {

  /** A JSON string literal (quoted, fully escaped). */
  def str(s: String): String = {
    if (s == null) return "null"
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
    sb.toString
  }
}
