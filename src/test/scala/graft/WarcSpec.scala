package graft

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.graphbuild.EdgeBuilder
import graft.sources.{PagesGen, Warc}

class WarcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(s"graft_warc_$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  private val pages = PagesGen.generate(TestSpark.spark,
    sites = 3, pagesPerSite = 4, seed = 42L, partitions = 2)

  test("gzip round trip: url/ts/html byte-identical, text per extraction contract") {
    val dir = tmpDir("gz")
    Warc.write(pages, dir, gzip = true)
    // drop Hadoop local-FS checksum sidecars (.part-*.crc)
    val files = new java.io.File(dir).list().sorted.toSeq.filterNot(_.startsWith("."))
    assert(files.nonEmpty && files.forall(_.endsWith(".warc.gz")))

    val back = Warc.readPages(spark, s"$dir/*.warc.gz")
      .collect().map(p => p.url -> p).toMap
    val orig = pages.collect()
    // WARC carries no lang column — readPages derives it with the engine's
    // heuristic, so the expectation is langId over the SAME text (PagesGen's
    // NATO-alphabet filler has no English markers → "und" here)
    val expectLang = pages
      .select(col("url"), graft.text.TextStats.langId(col("text")).as("l"))
      .as[(String, String)].collect().toMap
    assert(back.size == orig.length)
    orig.foreach { p =>
      val r = back(p.url)
      assert(r.warc_ts == p.warc_ts, s"ts mismatch for ${p.url}")
      assert(java.util.Arrays.equals(r.html, p.html), s"html bytes for ${p.url}")
      // PagesGen composes `text` from the content pieces independently of
      // the HTML assembly — equality here is the byte-identity contract
      assert(r.text == p.text, s"text for ${p.url}")
      assert(r.lang == expectLang(p.url), s"lang for ${p.url}")
    }
  }

  test("uncompressed round trip + graph parity with the direct pipeline") {
    val dir = tmpDir("raw")
    Warc.write(pages, dir, gzip = false)
    val viaWarc = Warc.readPages(spark, s"$dir/*.warc")
    val (_, e1, _) = EdgeBuilder.build(viaWarc)
    val (_, e2, _) = EdgeBuilder.build(pages)
    val k1 = e1.select("src_id", "dst_id").as[(Long, Long)].collect().toSet
    val k2 = e2.select("src_id", "dst_id").as[(Long, Long)].collect().toSet
    assert(k1 == k2 && k1.nonEmpty)
  }

  test("writer output is deterministic across runs (F19)") {
    val d1 = tmpDir("det1"); val d2 = tmpDir("det2")
    Warc.write(pages, d1, gzip = false)
    Warc.write(pages, d2, gzip = false)
    val fs1 = new java.io.File(d1).list().sorted
    val fs2 = new java.io.File(d2).list().sorted
    assert(fs1.sameElements(fs2))
    fs1.foreach { f =>
      val b1 = Files.readAllBytes(Paths.get(d1, f))
      val b2 = Files.readAllBytes(Paths.get(d2, f))
      assert(java.util.Arrays.equals(b1, b2), s"nondeterministic bytes in $f")
    }
  }

  test("parser skips non-response records, folds headers, tolerates header-only payload") {
    val html = "<html><body><p>hi</p></body></html>"
    val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$html"
    val req = "GET / HTTP/1.1\r\nHost: x\r\n\r\n"
    val raw =
      // warcinfo (skipped); payload is exactly 4 bytes ("k: v"), then the
      // bare \r\n\r\n record separator
      "WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Type: application/warc-fields\r\n" +
        "Content-Length: 4\r\n\r\nk: v\r\n\r\n" +
        // request record (skipped)
        s"WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: http://a.example/\r\n" +
        s"Content-Type: application/http; msgtype=request\r\nContent-Length: ${req.length}\r\n\r\n$req\r\n\r\n" +
        // response with a FOLDED header value
        s"WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Target-URI: http://a.example/\r\n folded-tail\r\n" +
        "WARC-Date: 2023-05-06T07:08:09Z\r\n" +
        s"Content-Type: application/http; msgtype=response\r\nContent-Length: ${http.length}\r\n\r\n$http\r\n\r\n"
    val dir = tmpDir("hand")
    Files.write(Paths.get(dir, "hand.warc"), raw.getBytes(ISO_8859_1))
    val got = Warc.read(spark, s"$dir/*.warc").collect()
    assert(got.length == 1)
    assert(got(0).url == "http://a.example/ folded-tail") // folding joins with one space
    assert(got(0).warc_ts.toInstant.toString == "2023-05-06T07:08:09Z")
    assert(new String(got(0).html, ISO_8859_1) == html)
  }
}
