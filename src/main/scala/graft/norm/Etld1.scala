package graft.norm

/** eTLD+1 (registrable domain) extraction — the reference computes it with
  * tldextract over the public-suffix list for every node/edge domain
  * (/root/reference/code/graph/utils.py:23-44, SURVEY.md §2.7 F1).
  *
  * Spark has no built-in; we bundle a compact public-suffix subset (entries
  * from the public Mozilla PSL, publicsuffix.org) plus the PSL fallback rule
  * ("the suffix of an unknown TLD is the TLD itself"). Longest-suffix-wins,
  * wildcard (`*.`) entries honored. Null-safe: unparseable → null, mirroring
  * the reference's try/except→None (SURVEY.md §2.11.6).
  *
  * This is intentionally a small deterministic subset, not the full 9k-line
  * list: at engine level the suffix table is a broadcast lookup and swapping
  * in the full list is a data change, not a code change.
  */
object Etld1 {
  // exact public suffixes (subset of publicsuffix.org; extend via data file)
  private val exact: Set[String] = Set(
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz", "name",
    "io", "co", "ai", "app", "dev", "me", "tv", "cc", "ws", "xyz", "site",
    "online", "store", "blog", "cloud", "example", "invalid", "localhost",
    "test", "us", "uk", "de", "fr", "it", "es", "nl", "be", "ch", "at",
    "se", "no", "fi", "dk", "pl", "cz", "ru", "jp", "cn", "in", "au", "nz",
    "br", "mx", "ar", "ca", "za", "kr", "tw", "hk", "sg", "ir", "tr", "gr",
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "me.uk", "ltd.uk",
    "plc.uk", "sch.uk", "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz", "co.jp", "ne.jp", "or.jp", "ac.jp",
    "go.jp", "com.cn", "net.cn", "org.cn", "gov.cn", "com.br", "net.br",
    "org.br", "gov.br", "co.in", "net.in", "org.in", "gov.in", "ac.in",
    "co.kr", "or.kr", "com.mx", "com.ar", "com.tr", "com.tw", "com.hk",
    "com.sg", "co.za", "com.ru", "org.ru", "github.io", "gitlab.io",
    "blogspot.com", "herokuapp.com", "appspot.com", "cloudfront.net",
    "amazonaws.com", "azurewebsites.net", "netlify.app", "vercel.app",
    "web.app", "firebaseapp.com", "pages.dev", "workers.dev", "repl.co"
  )
  // wildcard rules `*.<base>`: every direct child of <base> is a suffix
  private val wildcardBases: Set[String] = Set("ck", "er", "fk", "np", "pg")

  private def isSuffix(labels: Array[String], from: Int): Boolean = {
    val cand = labels.drop(from).mkString(".")
    if (exact.contains(cand)) true
    else if (from + 1 < labels.length &&
             wildcardBases.contains(labels.drop(from + 1).mkString("."))) true
    else false
  }

  /** Registrable domain of a bare hostname; null when none exists
    * (IP literals, single-label hosts, host == suffix). */
  def registrableDomain(host0: String): String = {
    if (host0 == null) return null
    val host = host0.toLowerCase.stripSuffix(".")
    if (host.isEmpty || host.forall(c => c.isDigit || c == '.') ||
        host.startsWith("[")) return null // IPv4 / IPv6 literals
    val labels = host.split('.')
    if (labels.length < 2 || labels.exists(_.isEmpty)) return null
    // longest matching public suffix; fallback rule: last label is a suffix
    var suffixStart = labels.length - 1
    var i = labels.length - 2
    while (i >= 1) {
      if (isSuffix(labels, i)) suffixStart = i
      i -= 1
    }
    // also check longer suffixes closer to the front (longest-wins already
    // handled by scanning to i=1); suffixStart is the earliest match
    if (suffixStart == 0) null // whole host is a public suffix
    else labels.drop(suffixStart - 1).mkString(".")
  }

  /** eTLD+1 of a (possibly denormalized) URL; null-safe. */
  def ofUrl(url: String): String =
    registrableDomain(UrlNorm.host(UrlNorm.normalize(url).getOrElse(
      if (url == null) "" else "http://" + url)))
}
