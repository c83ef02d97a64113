package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.features.Adblock

/** Adblock-Plus rule-matching goldens on a committed mini filter list —
  * the syntax subset the reference drives through adblockparser
  * (node_labelling.py:22-91): || host anchors, ^ separators, * wildcards,
  * |-anchors, @@ exceptions, $third-party / resource-type / $domain=
  * options, and the reference's option wiring per content_policy_type. */
class AdblockSpec extends AnyFunSuite {

  private val miniList = Seq(
    "! comment line",
    "[Adblock Plus 2.0]",
    "||ads.example.com^",
    "/banner/*",
    "@@||ads.example.com/acceptable^",
    "||track.example^$third-party",
    "||cdn.example^$script",
    "||geo.example^$domain=news.site|~sports.news.site",
    "|http://exact.example/pix|",
    "example.com##.ad-div" // element hiding: skipped
  )
  private val rules = Adblock.parseList(miniList)

  private def block(url: String, thirdParty: Boolean = false,
                    pageDomain: String = "page.example",
                    types: Set[String] = Set.empty): Boolean =
    Adblock.shouldBlock(rules, url, thirdParty, pageDomain, types)

  test("|| host anchor matches the domain and its subdomains only") {
    assert(block("http://ads.example.com/x.gif"))
    assert(block("https://sub.ads.example.com/x.gif"))
    assert(!block("http://notads.example.com/x.gif"))
  }

  test("^ separator matches punctuation or end, not letters") {
    assert(block("http://ads.example.com"))        // end of address
    assert(block("http://ads.example.com?q=1"))    // '?' separator
    assert(!block("http://ads.example.community/")) // letter continues
  }

  test("wildcard and anchors") {
    assert(block("http://x.example/banner/top.png"))
    assert(!block("http://x.example/banners.css"))
    assert(block("http://exact.example/pix"))
    assert(!block("http://exact.example/pixel")) // end anchor
    assert(!block("https://exact.example/pix"))  // start anchor
  }

  test("@@ exception wins over a blocking match") {
    assert(block("http://ads.example.com/bad.js"))
    assert(!block("http://ads.example.com/acceptable/ok.js"))
  }

  test("$third-party blocks only cross-site loads") {
    assert(block("http://track.example/t.js", thirdParty = true))
    assert(!block("http://track.example/t.js", thirdParty = false))
  }

  test("$script blocks only script resource types") {
    assert(block("http://cdn.example/lib.js", types = Set("script")))
    assert(!block("http://cdn.example/lib.js", types = Set("image")))
    assert(!block("http://cdn.example/lib.js"))
  }

  test("$domain= constrains the visited page, with negation") {
    assert(block("http://geo.example/x", pageDomain = "news.site"))
    assert(block("http://geo.example/x", pageDomain = "mobile.news.site"))
    assert(!block("http://geo.example/x", pageDomain = "sports.news.site"))
    assert(!block("http://geo.example/x", pageDomain = "other.site"))
  }

  test("$domain= walks variants most-specific-first (adblockparser parity)") {
    // specific positive overrides a broader negative: adblockparser's
    // _domain_matches returns the polarity of the FIRST variant hit
    val r = Adblock.parseList(Seq(
      "||mix.example^$domain=~example.com|shop.example.com")).head
    def b(page: String) =
      Adblock.shouldBlock(Seq(r), "http://mix.example/x", thirdParty = false,
        page, Set.empty)
    assert(b("shop.example.com"))        // specific positive wins
    assert(b("a.shop.example.com"))      // subdomain walks to the positive first
    assert(!b("other.example.com"))      // hits the negative parent
    assert(!b("unrelated.com"))          // no hit + a positive exists → no match
    // all-negated fallback: match iff every rule domain is negated
    val neg = Adblock.parseList(Seq("||anywhere.example^$domain=~bad.com")).head
    assert(Adblock.shouldBlock(Seq(neg), "http://anywhere.example/x",
      thirdParty = false, "good.com", Set.empty))
    assert(!Adblock.shouldBlock(Seq(neg), "http://anywhere.example/x",
      thirdParty = false, "sub.bad.com", Set.empty))
  }

  test("$match-case is ignored, not unsupported (rule still evaluates)") {
    val r = Adblock.parseList(Seq("||cased.example^$match-case"))
    assert(r.size === 1)
    assert(Adblock.shouldBlock(r, "http://cased.example/x", thirdParty = false,
      "page.example", Set.empty))
  }

  test("raw /regex/ rules pass through as regex, not literal text") {
    val r = Adblock.parseList(Seq("/banner\\d+/"))
    assert(r.size === 1)
    assert(Adblock.shouldBlock(r, "http://x.example/banner123", thirdParty = false,
      "page.example", Set.empty))
    assert(!Adblock.shouldBlock(r, "http://x.example/banner/x", thirdParty = false,
      "page.example", Set.empty))
  }

  test("reference option wiring: node type + party (match_url semantics)") {
    // third-party derives from page vs node domain; script cpt → script opt
    assert(Adblock.nodeBlocked(rules, "http://track.example/t.js",
      pageDomain = "page.example", nodeDomain = "track.example",
      resourceType = "script"))
    assert(!Adblock.nodeBlocked(rules, "http://track.example/t.js",
      pageDomain = "track.example", nodeDomain = "track.example",
      resourceType = "script"))
    assert(Adblock.nodeBlocked(rules, "http://cdn.example/lib.js",
      pageDomain = "page.example", nodeDomain = "cdn.example",
      resourceType = "script"))
    assert(!Adblock.nodeBlocked(rules, "http://cdn.example/pic.png",
      pageDomain = "page.example", nodeDomain = "cdn.example",
      resourceType = "image"))
  }

  test("labelNodes: disjunction across lists, null on missing domains") {
    val spark = TestSpark.spark
    import spark.implicits._
    val nodes = Seq(
      (1L, "http://ads.example.com/a.gif", "http://p.example/", "Request",
        """{"content_policy_type":"image"}""", "ads.example.com", "p.example"),
      (1L, "http://fine.example/ok.css", "http://p.example/", "Request",
        """{"content_policy_type":"stylesheet"}""", "fine.example", "p.example"),
      (1L, "http://nodomain.example/x", "http://p.example/", "Request",
        null, null, "p.example")
    ).toDF("visit_id", "name", "top_level_url", "type", "attr", "domain",
      "top_level_domain")
    val out = Adblock.labelNodes(nodes, Seq(rules)).collect()
      .map(r => r.getAs[String]("name") ->
        Option(r.getAs[java.lang.Boolean]("label"))).toMap
    assert(out("http://ads.example.com/a.gif") === Some(true))
    assert(out("http://fine.example/ok.css") === Some(false))
    assert(out("http://nodomain.example/x") === None) // reference "Error"
  }
}
