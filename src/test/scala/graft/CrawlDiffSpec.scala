package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graphbuild.CrawlDiff

/** CrawlDiff: edge-level added/removed/persisted classification across two
  * snapshots and per-host churn aggregation (real-PSL host mapping). */
class CrawlDiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val snapA = Seq(
    ("http://a.com/1", "http://b.com/x"),  // persists
    ("http://a.com/1", "http://b.com/x"),  // dup within snapshot: one edge
    ("http://a.com/2", "http://c.com/y"),  // removed in B
    ("http://www.d.com/p", "http://a.com/3")) // removed (www → d.com host)
  private val snapB = Seq(
    ("http://a.com/1", "http://b.com/x"),  // persisted
    ("http://a.com/9", "http://c.com/z"))  // added

  test("edgeDiff classifies added/removed/persisted on dedup'd edges") {
    val got = CrawlDiff.edgeDiff(snapA.toDF("src", "dst"),
        snapB.toDF("src", "dst"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2))
      .toMap
    assert(got == Map(
      ("http://a.com/1", "http://b.com/x") -> "persisted",
      ("http://a.com/2", "http://c.com/y") -> "removed",
      ("http://www.d.com/p", "http://a.com/3") -> "removed",
      ("http://a.com/9", "http://c.com/z") -> "added"))
  }

  test("hostChurn aggregates per source eTLD+1") {
    val diff = CrawlDiff.edgeDiff(snapA.toDF("src", "dst"),
      snapB.toDF("src", "dst"))
    val got = CrawlDiff.hostChurn(diff)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      "a.com" -> ((1L, 1L, 1L)),   // added /9, removed /2, persisted /1
      "d.com" -> ((0L, 1L, 0L))))  // www.d.com collapses to d.com
  }

  test("contractedDiff tracks host-pair weight deltas across snapshots") {
    // Snapshot A: a.com→b.com weight 2 (two distinct url links, one dup
    // that must NOT count), a.com→c.com weight 1.
    val a = Seq(
      ("http://a.com/1", "http://b.com/x"),
      ("http://a.com/2", "http://b.com/y"),
      ("http://a.com/2", "http://b.com/y"),   // url-level dup: weight stays 2
      ("http://a.com/1", "http://c.com/z")).toDF("src", "dst")
    // Snapshot B: a.com→b.com shrinks to weight 1 (persisted, delta −1),
    // a.com→c.com gone (removed), e.co.uk→a.com new (added; real-PSL host).
    val b = Seq(
      ("http://a.com/1", "http://b.com/x"),
      ("http://sub.e.co.uk/p", "http://a.com/3")).toDF("src", "dst")
    val got = CrawlDiff.contractedDiff(a, b).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))))
      .toMap
    assert(got == Map(
      ("a.com", "b.com") -> ((2L, 1L, -1L, "persisted")),
      ("a.com", "c.com") -> ((1L, 0L, -1L, "removed")),
      ("e.co.uk", "a.com") -> ((0L, 1L, 1L, "added"))))
  }
}
