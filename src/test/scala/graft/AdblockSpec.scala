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
