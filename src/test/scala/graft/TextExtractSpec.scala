package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.TextExtract
import graft.sources.PagesGen

class TextExtractSpec extends AnyFunSuite {

  test("tags stripped, script/style/comments dropped, entities decoded") {
    val html =
      """<html><head><title>T</title><style>p {x}</style></head>
        |<body><!-- c --><h1>A &amp; B</h1><script>var x = "<p>";</script>
        |<p>one  two
        |three</p><div>4 &lt;5&gt; &quot;q&quot; &#39;s&#39; &#x41;</div></body></html>
        |""".stripMargin
    assert(TextExtract.text(html) == "T A & B one two three 4 <5> \"q\" 's' A")
  }

  test("unknown entities pass through; unterminated script swallowed") {
    assert(TextExtract.text("<p>a &unknown; b</p>") == "a &unknown; b")
    assert(TextExtract.text("<p>x</p><script>leak") == "x")
    assert(TextExtract.text("<p>a & b</p>") == "a & b")
  }

  test("malformed utf-8 replaced deterministically") {
    val bad = Array[Byte]('a'.toByte, 0xff.toByte, 'b'.toByte)
    assert(TextExtract.text(bad) == "a�b")
  }

  test("href extraction: quoted, unquoted, entity-decoded, ordered") {
    val html =
      """<a href="http://a.example/x?p=1&amp;q=2">1</a>
        |<A HREF='/rel'>2</A>
        |<a class="z" href=plain>3</a>
        |<a>none</a><abbr href="no">not an anchor</abbr>""".stripMargin
    assert(TextExtract.hrefs(html) ==
      Vector("http://a.example/x?p=1&q=2", "/rel", "plain"))
  }

  test("PagesGen text is byte-identical to TextExtract over generated html") {
    // the non-circularity check: generator composes `text` from pieces,
    // extractor parses the assembled html — both must agree byte-for-byte
    (0 until 200).foreach { idx =>
      val p = PagesGen.mkPage(seed = 42L, sites = 10, pagesPerSite = 20, idx = idx)
      val extracted = TextExtract.text(p.html)
      assert(extracted == p.text, s"idx=$idx url=${p.url}")
      // byte-identity, not just string equality
      assert(java.util.Arrays.equals(
        extracted.getBytes(StandardCharsets.UTF_8),
        p.text.getBytes(StandardCharsets.UTF_8)))
    }
  }
}
