package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.norm.{Etld1, UrlNorm}

class NormSpec extends AnyFunSuite {

  test("normalize canonicalizes scheme/host/port/fragment") {
    assert(UrlNorm.normalize("HTTP://SITE0.EXAMPLE:80/p0#top")
      .contains("http://site0.example/p0"))
    assert(UrlNorm.normalize("https://Host.COM:443/a?b=1#f")
      .contains("https://host.com/a?b=1"))
    assert(UrlNorm.normalize("http://h.com:8080/x")
      .contains("http://h.com:8080/x"))
    assert(UrlNorm.normalize("http://h.com").contains("http://h.com/"))
    assert(UrlNorm.normalize("http://h.com?q=1").contains("http://h.com/?q=1"))
    assert(UrlNorm.normalize("ftp://h.com/x").isEmpty)
    assert(UrlNorm.normalize("not a url").isEmpty)
    assert(UrlNorm.normalize(null).isEmpty)
  }

  test("dot segments removed per RFC 3986") {
    assert(UrlNorm.normalize("http://h.com/a/b/../c").contains("http://h.com/a/c"))
    assert(UrlNorm.normalize("http://h.com/a/./b/.").contains("http://h.com/a/b/"))
    assert(UrlNorm.normalize("http://h.com/../x").contains("http://h.com/x"))
  }

  test("resolve handles relative forms") {
    val base = "http://site1.example/dir/p5"
    assert(UrlNorm.resolve(base, "/p2").contains("http://site1.example/p2"))
    assert(UrlNorm.resolve(base, "p2").contains("http://site1.example/dir/p2"))
    assert(UrlNorm.resolve(base, "../p2").contains("http://site1.example/p2"))
    assert(UrlNorm.resolve(base, "?x=1").contains("http://site1.example/dir/p5?x=1"))
    assert(UrlNorm.resolve(base, "//other.example/q").contains("http://other.example/q"))
    assert(UrlNorm.resolve(base, "https://o.example/q").contains("https://o.example/q"))
    assert(UrlNorm.resolve(base, "#frag").isEmpty)
    assert(UrlNorm.resolve(base, "mailto:a@b.c").isEmpty)
    assert(UrlNorm.resolve(base, "javascript:void(0)").isEmpty)
    assert(UrlNorm.resolve(base, "").isEmpty)
  }

  test("eTLD+1 longest-suffix + fallback rule") {
    assert(Etld1.registrableDomain("www.example.co.uk") == "example.co.uk")
    assert(Etld1.registrableDomain("a.b.github.io") == "b.github.io")
    assert(Etld1.registrableDomain("sub.site3.example") == "site3.example")
    assert(Etld1.registrableDomain("site3.example") == "site3.example")
    assert(Etld1.registrableDomain("foo.unknowntld") == "foo.unknowntld") // fallback
    assert(Etld1.registrableDomain("com") == null)
    assert(Etld1.registrableDomain("127.0.0.1") == null)
    assert(Etld1.registrableDomain(null) == null)
    assert(Etld1.ofUrl("HTTP://WWW.Example.CO.UK:80/x") == "example.co.uk")
  }
}
