package graft.norm

/** Deterministic URL resolution + normalization (pure Scala, no exceptions,
  * no java.net.URI — its parser throws on common web dirt and its behavior
  * varies with IDN config; at Common-Crawl dirt levels malformed hrefs must
  * map to None, never to a task failure — SURVEY.md §2.11.6).
  *
  * Normal form: `scheme://host[:port]/path[?query]` with
  *  - scheme ∈ {http, https}, lowercased
  *  - host lowercased, trailing dot stripped
  *  - default ports (80 for http, 443 for https) removed
  *  - fragment stripped
  *  - dot-segments removed per RFC 3986 §5.2.4
  *  - empty path → "/"
  * Percent-encodings are preserved byte-for-byte (re-encoding is not
  * canonical across agents; preserving is deterministic).
  */
object UrlNorm {

  private def isDefaultPort(scheme: String, port: String): Boolean =
    (scheme == "http" && port == "80") || (scheme == "https" && port == "443")

  /** RFC 3986 §5.2.4 remove_dot_segments, operating on a path that starts
    * with '/'. Deterministic, single pass. */
  private[norm] def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    // split keeping empty segments sane; path always starts with '/'
    val segs = path.split("/", -1)
    var i = 1 // segs(0) is "" before the leading slash
    while (i < segs.length) {
      val s = segs(i)
      val isLast = i == segs.length - 1
      s match {
        case "." => if (isLast) out += ""
        case ".." =>
          if (out.nonEmpty) out.remove(out.length - 1)
          if (isLast) out += ""
        case other => out += other
      }
      i += 1
    }
    "/" + out.mkString("/")
  }

  /** Parse an absolute http(s) URL into (scheme, hostPort, pathQuery).
    * Returns None for anything else. */
  private def splitAbs(url: String): Option[(String, String, String)] = {
    val lower = url
    val schemeEnd = lower.indexOf("://")
    if (schemeEnd <= 0) return None
    val scheme = lower.substring(0, schemeEnd).toLowerCase
    if (scheme != "http" && scheme != "https") return None
    val rest = lower.substring(schemeEnd + 3)
    if (rest.isEmpty) return None
    val slash = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
    if (slash < 0) Some((scheme, rest, "/"))
    else {
      val hp = rest.substring(0, slash)
      if (hp.isEmpty) return None
      val tail = if (rest.charAt(slash) == '/') rest.substring(slash)
                 else "/" + rest.substring(slash) // host?q / host#f
      Some((scheme, hp, tail))
    }
  }

  /** Normalize an absolute URL. None if not http(s) / unparseable. */
  def normalize(url: String): Option[String] = {
    if (url == null) return None
    splitAbs(url.trim).flatMap { case (scheme, hostPort0, pathQueryFrag) =>
      // strip userinfo (rare, but keep deterministic)
      val hostPort = {
        val at = hostPort0.lastIndexOf('@')
        if (at >= 0) hostPort0.substring(at + 1) else hostPort0
      }
      val (host0, port) = hostPort.lastIndexOf(':') match {
        case -1 => (hostPort, "")
        case c if hostPort.indexOf(']') < c || !hostPort.contains(']') =>
          (hostPort.substring(0, c), hostPort.substring(c + 1))
        case _ => (hostPort, "") // ipv6 literal without port
      }
      val host = host0.toLowerCase.stripSuffix(".")
      if (host.isEmpty || !port.forall(_.isDigit)) return None
      val noFrag = pathQueryFrag.indexOf('#') match {
        case -1 => pathQueryFrag
        case f  => pathQueryFrag.substring(0, f)
      }
      val (path0, query) = noFrag.indexOf('?') match {
        case -1 => (noFrag, "")
        case q  => (noFrag.substring(0, q), noFrag.substring(q))
      }
      val path = removeDotSegments(if (path0.isEmpty) "/" else path0)
      val portPart =
        if (port.isEmpty || isDefaultPort(scheme, port)) "" else ":" + port
      Some(s"$scheme://$host$portPart$path$query")
    }
  }

  /** Resolve `href` against normalized absolute `base`, then normalize.
    * Covers the reference-relevant cases: absolute, scheme-relative (`//h/p`),
    * root-relative (`/p`), query-only (`?q`), fragment-only (stays on page →
    * None, a self-link carries no graph information), and relative paths. */
  def resolve(base: String, href0: String): Option[String] = {
    if (href0 == null) return None
    val href = href0.trim
    if (href.isEmpty || href.startsWith("#")) return None
    if (href.contains("://")) return normalize(href)
    // reject other schemes (mailto:, javascript:, data:)
    val colon = href.indexOf(':')
    if (colon >= 0 && (colon < href.indexOf('/') || !href.contains('/')) &&
        href.substring(0, colon).forall(c => c.isLetter || c == '+' || c == '-' || c == '.'))
      return None
    splitAbs(base).flatMap { case (scheme, hostPort, basePathQuery) =>
      val basePath = basePathQuery.indexOf('?') match {
        case -1 => basePathQuery
        case q  => basePathQuery.substring(0, q)
      }
      val abs =
        if (href.startsWith("//")) s"$scheme:$href"
        else if (href.startsWith("/")) s"$scheme://$hostPort$href"
        else if (href.startsWith("?")) s"$scheme://$hostPort$basePath$href"
        else {
          val dir = basePath.substring(0, basePath.lastIndexOf('/') + 1)
          s"$scheme://$hostPort$dir$href"
        }
      normalize(abs)
    }
  }

  /** Host of a normalized URL ("" if unparseable). */
  def host(url: String): String =
    splitAbs(if (url == null) "" else url).map(_._2.takeWhile(_ != ':')).getOrElse("")
}
