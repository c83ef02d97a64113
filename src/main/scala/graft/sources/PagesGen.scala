package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.core.Hashing.{bounded, h}
import graft.model.Page

/** Deterministic synthetic Common-Crawl-style pages table
  * (url, warc_ts, html, text, lang) — repo:BASELINE.json input_hint says
  * "synthesise it deterministically at small scale; no external data".
  *
  * Every row is a pure function of (seed, sites, pagesPerSite, idx): no
  * wall-clock, no Random, no partition-dependent state — so the table is
  * byte-identical across runs and parallelism levels (FIXTURES.md §1), and
  * generation itself distributes via `spark.range` (no driver-side loop, so
  * the same generator scales to the bench graph of FIXTURES.md §7).
  *
  * Structure (gives known graph features for tests):
  *  - host `site{i}.example`, path `/p{j}`;
  *  - a global hub `site0.example/p0` that every page links to (skew fixture);
  *  - intra-site ring (+ one long intra jump) and seeded cross-site links;
  *  - deliberately denormalized href variants (uppercase host, `:80`,
  *    `#frag`, relative paths) exercising graft.norm.UrlNorm;
  *  - `text` is composed directly from the content pieces by the extraction
  *    spec — independently of the HTML assembly — so TextExtract byte-identity
  *    tests are non-circular.
  */
object PagesGen {

  private val words: Array[String] = Array(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel",
    "india", "juliet", "kilo", "lima", "mike", "november", "oscar", "papa",
    "quebec", "romeo", "sierra", "tango", "uniform", "victor", "whiskey",
    "xray", "yankee", "zulu", "amber", "basalt", "cedar", "dune", "ember",
    "fjord", "granite", "harbor", "isle", "jade", "krill", "lagoon", "mesa",
    "nectar", "onyx", "prairie", "quartz", "reef", "summit", "thicket",
    "umber", "vale", "willow", "xenon", "yonder", "zephyr", "anchor",
    "beacon", "cairn", "delta2", "estuary", "flint", "grove", "heath",
    "inlet", "juniper", "knoll", "larch"
  )

  private val epochBase = 1672531200000L // 2023-01-01T00:00:00Z

  def url(site: Int, page: Int): String = s"http://site$site.example/p$page"

  private def para(seed: Long, site: Int, page: Int, k: Int, len: Int): String = {
    val sb = new StringBuilder
    var w = 0
    while (w < len) {
      if (w > 0) sb += ' '
      sb ++= words(bounded(h(seed, site, page, k, w), words.length))
      w += 1
    }
    sb.toString
  }

  /** All outlink hrefs of page (site i, page j), raw (pre-normalization). */
  def rawHrefs(seed: Long, sites: Int, pagesPerSite: Int, i: Int, j: Int): Vector[String] = {
    val out = Vector.newBuilder[String]
    // hub link, in a denormalized form chosen by hash
    out += (bounded(h(seed, i, j, 100), 4) match {
      case 0 => "http://site0.example/p0"
      case 1 => "HTTP://SITE0.EXAMPLE:80/p0#top"
      case 2 => "http://Site0.Example/p0"
      case 3 => "//site0.example/p0"
    })
    // intra-site ring (root-relative) + long jump (relative path)
    out += s"/p${(j + 1) % pagesPerSite}"
    out += s"p${(j * 7 + 3) % pagesPerSite}"
    // cross-site links (2), seeded
    var c = 0
    while (c < 2) {
      val ti = (i + 1 + bounded(h(seed, i, j, 200, c), 5)) % sites
      val tj = bounded(h(seed, i, j, 300, c), pagesPerSite)
      out += (if (bounded(h(seed, i, j, 400, c), 3) == 0)
                s"http://SITE$ti.example:80/p$tj#s"
              else url(ti, tj))
      c += 1
    }
    out.result()
  }

  /** Pure page constructor. */
  def mkPage(seed: Long, sites: Int, pagesPerSite: Int, idx: Long): Page = {
    val i = (idx / pagesPerSite).toInt
    val j = (idx % pagesPerSite).toInt
    val title = s"Site $i page $j"
    val p0 = para(seed, i, j, 0, 8 + bounded(h(seed, i, j, 1), 12))
    val p1 = para(seed, i, j, 1, 6 + bounded(h(seed, i, j, 2), 10))
    val hrefs = rawHrefs(seed, sites, pagesPerSite, i, j)
    val anchors = hrefs.indices.map(k => s"anchor $k")
    val html = {
      val sb = new StringBuilder(1024)
      sb ++= "<!DOCTYPE html><html><head><title>" ++= title ++= "</title>\n"
      sb ++= "<style>body { color: #000; }</style></head>\n"
      sb ++= s"<body><!-- gen $i/$j -->\n<h1>" ++= title ++= "</h1>\n"
      sb ++= s"<script type=\"text/javascript\">var p = $j;</script>\n"
      sb ++= "<p>" ++= p0 ++= "</p>\n<p>" ++= p1 ++= " R&amp;D</p>\n<ul>\n"
      hrefs.indices.foreach { k =>
        sb ++= s"""<li><a href="${hrefs(k)}">${anchors(k)}</a></li>\n"""
      }
      sb ++= "</ul>\n</body></html>"
      sb.toString
    }
    // expected text per the TextExtract spec, composed from the pieces
    val text = (Seq(title, title, p0, p1 + " R&D") ++ anchors).mkString(" ")
    Page(
      url = url(i, j),
      warc_ts = new Timestamp(epochBase + idx * 1000L),
      html = html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      text = text,
      lang = "en"
    )
  }

  /** Distributed generation: S×P rows, no driver loop. */
  def generate(spark: SparkSession, sites: Int, pagesPerSite: Int,
               seed: Long = 42L, partitions: Int = 32): Dataset[Page] = {
    import spark.implicits._
    spark.range(0, sites.toLong * pagesPerSite, 1, partitions)
      .map(idx => mkPage(seed, sites, pagesPerSite, idx))
  }
}
