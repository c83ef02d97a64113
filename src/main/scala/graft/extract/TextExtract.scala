package graft.extract

import java.nio.charset.StandardCharsets
import java.nio.charset.CodingErrorAction
import java.nio.ByteBuffer

/** Deterministic HTML → text and HTML → outlink extraction.
  *
  * The north rule's per-row invariant (repo:BASELINE.json input_hint) demands
  * **byte-identical extracted text per url** across runs, JVMs and
  * parallelism levels. So this is a single-pass, allocation-bounded,
  * spec-pinned extractor — no external parser, no locale-dependent calls,
  * no map-iteration order anywhere.
  *
  * Extraction spec (fixed; tests pin it byte-for-byte):
  *  1. Decode bytes as UTF-8 with REPLACE on malformed/unmappable input.
  *  2. Drop everything inside <script>…</script>, <style>…</style> and
  *     <!-- … --> (case-insensitive tag match, attributes allowed).
  *  3. Every other tag becomes a single space.
  *  4. Decode exactly the five core entities: &amp; &lt; &gt; &quot; &#39;
  *     (+ numeric &#NN; / &#xNN; for code points < 0x10000). Unknown
  *     entities pass through literally.
  *  5. Collapse runs of [ \t\r\n] to one space; trim.
  */
object TextExtract {

  def decodeUtf8(bytes: Array[Byte]): String = {
    if (bytes == null) return ""
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(ByteBuffer.wrap(bytes)).toString
  }

  private def regionMatchesIgnoreCase(s: String, at: Int, lit: String): Boolean =
    s.regionMatches(true, at, lit, 0, lit.length)

  /** Find the end index (exclusive) of `</tag ...>` starting search at `from`;
    * -1 if unterminated. */
  private def findCloseTag(s: String, from: Int, tag: String): Int = {
    var i = from
    val lit = "</" + tag
    while (i < s.length) {
      if (s.charAt(i) == '<' && regionMatchesIgnoreCase(s, i, lit)) {
        val after = i + lit.length
        if (after < s.length && (s.charAt(after) == '>' || s.charAt(after).isWhitespace)) {
          val gt = s.indexOf('>', after)
          return if (gt < 0) -1 else gt + 1
        }
      }
      i += 1
    }
    -1
  }

  private def appendEntity(s: String, i: Int, out: java.lang.StringBuilder): Int = {
    // s(i) == '&'; returns next index after consumed input
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) { out.append('&'); return i + 1 }
    val body = s.substring(i + 1, semi)
    body match {
      case "amp"  => out.append('&'); semi + 1
      case "lt"   => out.append('<'); semi + 1
      case "gt"   => out.append('>'); semi + 1
      case "quot" => out.append('"'); semi + 1
      case "nbsp" => out.append(' '); semi + 1
      case _ if body.startsWith("#") =>
        val num = body.substring(1)
        val cp =
          try {
            if (num.startsWith("x") || num.startsWith("X"))
              Integer.parseInt(num.substring(1), 16)
            else Integer.parseInt(num, 10)
          } catch { case _: NumberFormatException => -1 }
        if (cp >= 0x20 && cp < 0x10000 && !(cp >= 0xd800 && cp <= 0xdfff)) {
          out.append(cp.toChar); semi + 1
        } else { out.append('&'); i + 1 }
      case _ => out.append('&'); i + 1
    }
  }

  /** Extract visible text from HTML string per the fixed spec above. */
  def text(html: String): String = {
    if (html == null) return ""
    val n = html.length
    val raw = new java.lang.StringBuilder(n / 2)
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (regionMatchesIgnoreCase(html, i, "<!--")) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (regionMatchesIgnoreCase(html, i, "<script") &&
                   (i + 7 >= n || !html.charAt(i + 7).isLetter)) {
          val end = findCloseTag(html, i, "script")
          i = if (end < 0) n else end
          raw.append(' ')
        } else if (regionMatchesIgnoreCase(html, i, "<style") &&
                   (i + 6 >= n || !html.charAt(i + 6).isLetter)) {
          val end = findCloseTag(html, i, "style")
          i = if (end < 0) n else end
          raw.append(' ')
        } else {
          val gt = html.indexOf('>', i + 1)
          i = if (gt < 0) n else gt + 1
          raw.append(' ')
        }
      } else if (c == '&') {
        i = appendEntity(html, i, raw)
      } else {
        raw.append(c)
        i += 1
      }
    }
    // collapse ASCII whitespace runs, trim
    val out = new java.lang.StringBuilder(raw.length)
    var j = 0
    var pendingSpace = false
    while (j < raw.length) {
      val c = raw.charAt(j)
      if (c == ' ' || c == '\t' || c == '\r' || c == '\n') pendingSpace = true
      else {
        if (pendingSpace && out.length > 0) out.append(' ')
        out.append(c)
        pendingSpace = false
      }
      j += 1
    }
    out.toString
  }

  def text(bytes: Array[Byte]): String = text(decodeUtf8(bytes))

  /** Raw (unresolved) href values of <a> tags, in document order.
    * Handles single/double-quoted and unquoted attribute values; entity-decodes
    * `&amp;` inside hrefs (the one entity that legitimately appears there). */
  def hrefs(html: String): Vector[String] = {
    if (html == null) return Vector.empty
    val out = Vector.newBuilder[String]
    val n = html.length
    var i = 0
    while (i < n) {
      if (html.charAt(i) == '<' && regionMatchesIgnoreCase(html, i, "<a") &&
          i + 2 < n && (html.charAt(i + 2) == ' ' || html.charAt(i + 2) == '\t' ||
                        html.charAt(i + 2) == '\n' || html.charAt(i + 2) == '\r')) {
        val gt = html.indexOf('>', i)
        val end = if (gt < 0) n else gt
        val tag = html.substring(i, end)
        val h = tag.toLowerCase.indexOf("href")
        if (h >= 0) {
          var k = i + h + 4
          while (k < end && (html.charAt(k).isWhitespace)) k += 1
          if (k < end && html.charAt(k) == '=') {
            k += 1
            while (k < end && html.charAt(k).isWhitespace) k += 1
            if (k < end) {
              val q = html.charAt(k)
              val value =
                if (q == '"' || q == '\'') {
                  val close = html.indexOf(q, k + 1)
                  if (close < 0 || close > end) "" else html.substring(k + 1, close)
                } else {
                  var e = k
                  while (e < end && !html.charAt(e).isWhitespace) e += 1
                  html.substring(k, e)
                }
              if (value.nonEmpty) out += value.replace("&amp;", "&")
            }
          }
        }
        i = end + 1
      } else i += 1
    }
    out.result()
  }

  def hrefs(bytes: Array[Byte]): Vector[String] = hrefs(decodeUtf8(bytes))
}
