package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.graphbuild.HostGraph

/** HostGraph contraction: url-level dedup, eTLD+1 mapping (REAL PSL rules
  * here — the g24/g25 oracle fixture deliberately stays in unknown-TLD
  * space where etld1 degenerates to last-two-labels; this spec pins the
  * PSL-proper cases), null/self-loop handling, id stability. */
class HostGraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val urls = Seq(
    // two pages on www.a.co.uk → one page on b.com (dup'd: counts once)
    ("http://www.a.co.uk/p1", "http://b.com/x"),
    ("http://www.a.co.uk/p1", "http://b.com/x"), // exact dup
    ("http://www.a.co.uk/p2", "http://b.com/x"),
    // different subdomain, same registrable domain → same src_host
    ("http://m.a.co.uk/p3", "http://b.com/y"),
    // intra-host after contraction (sub1.b.com → b.com) → dropped
    ("http://sub1.b.com/p", "http://b.com/q"),
    // unparseable src (IP literal) → null host → dropped
    ("http://192.168.0.1/p", "http://b.com/z"),
    // reverse direction exists separately
    ("http://b.com/r", "http://www.a.co.uk/s"))

  test("contract dedups urls, maps eTLD+1, drops nulls and self-loops") {
    val got = HostGraph.contract(urls.toDF("src", "dst"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // a.co.uk → b.com: p1 (deduped), p2, p3 = 3 distinct url links
    assert(got == Map(
      ("a.co.uk", "b.com") -> 3L,
      ("b.com", "a.co.uk") -> 1L))
  }

  test("withIds assigns deterministic content-derived ids") {
    val he = HostGraph.contract(urls.toDF("src", "dst"))
    val (e1, h1) = HostGraph.withIds(he)
    val (e2, h2) = HostGraph.withIds(he)
    assert(e1.collect().toSet == e2.collect().toSet) // replay-stable
    val hosts = h1.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hosts.values.toSet == Set("a.co.uk", "b.com"))
    assert(hosts.size == 2) // distinct ids
    // edges reference exactly the host ids
    val ids = e1.select("src").union(e1.select("dst"))
      .collect().map(_.getLong(0)).toSet
    assert(ids == hosts.keySet)
    assert(h1.collect().toSet == h2.collect().toSet)
  }

  test("rankHosts warm-started from the previous snapshot converges in " +
      "fewer supersteps to the same ranks") {
    import org.apache.spark.sql.functions._
    // Hub-and-chain host graph in unknown-TLD space (etld1 ⇒ h<i>.example):
    // every host links the hub h0, h0 links back to every 7th — cold-start
    // PageRank moves a lot of mass onto the hub, so uniform init starts far
    // from the fixpoint while the previous snapshot's ranks start close.
    def urls(edges: Seq[(Int, Int)]) =
      edges.zipWithIndex.map { case ((a, b), i) =>
        (s"http://h$a.example/p${i % 3}", s"http://h$b.example/q") }
        .toDF("src", "dst")
    val n = 40
    val base = (0 until n - 1).map(i => (i, i + 1)) ++
      (1 until n).map(i => (i, 0)) ++
      (0 until n by 7).map(i => (0, i)) // (0,0) intra-host: dropped
    // snapshot B: small churn — two links rot, three appear, ONE NEW HOST
    // (h40 exercises the warm path's new-vertex 1/N + renormalize contract)
    val snapB = base.filterNot(e => e == ((5, 6)) || e == ((11, 0))) ++
      Seq((3, 40), (40, 7), (12, 19))
    val p = graft.algo.PageRank.Params(tol = 1e-4, maxIter = 300,
      numPartitions = 4, weightCol = Some("weight"))
    val (ranksA, _) = HostGraph.rankHosts(urls(base), None, p)
    val prevA = ranksA.localCheckpoint(true)
    graft.core.Checkpoints.releaseLeaves(ranksA)
    val (coldB0, coldSteps) = HostGraph.rankHosts(urls(snapB), None, p)
    val (warmB0, warmSteps) = HostGraph.rankHosts(urls(snapB), Some(prevA), p)
    val coldB = coldB0.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val warmB = warmB0.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    graft.core.Checkpoints.releaseLeaves(coldB0)
    graft.core.Checkpoints.releaseLeaves(warmB0)
    graft.core.Checkpoints.release(prevA)
    assert(warmSteps < coldSteps,
      s"warm start took $warmSteps supersteps vs cold $coldSteps")
    assert(coldB.keySet == warmB.keySet && coldB.contains("h40.example"))
    // both runs sit at the same fixpoint (within the loop's own tolerance
    // amplified by 1/(1-d) — the standard PageRank error bound)
    val maxDiff = coldB.map { case (h, r) => math.abs(r - warmB(h)) }.max
    assert(maxDiff < 2e-3, s"max rank divergence $maxDiff")
  }

  test("custom host rule is pluggable (raw authority)") {
    import org.apache.spark.sql.functions._
    val got = HostGraph.contract(urls.toDF("src", "dst"),
        u => regexp_extract(u, "^https?://([^/]+)", 1))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // raw authority keeps subdomains apart; sub1.b.com → b.com survives
    assert(got(("sub1.b.com", "b.com")) == 1L)
    assert(got(("www.a.co.uk", "b.com")) == 2L) // p1 deduped + p2
    assert(got(("m.a.co.uk", "b.com")) == 1L)
    // IP authority is non-null under the raw rule → edge kept
    assert(got(("192.168.0.1", "b.com")) == 1L)
  }

  test("contracted host graph round-trips through the graph.csv sink " +
       "(export → re-ingest ≡ contract output)") {
    val contracted = HostGraph.contract(urls.toDF("src", "dst"))
    val dir = java.nio.file.Files.createTempDirectory("hostcsv").toString
    HostGraph.exportGraphCsv(contracted, s"$dir/graph_csv")
    val back = HostGraph.importGraphCsv(spark, s"$dir/graph_csv")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(asSet(back) == asSet(contracted) && back.count() > 0)
    // the export is the reference's 23-column unified shape: every host
    // appears as a Node row, every link as an Edge row
    val uni = graft.sources.GraphCsv.read(spark, s"$dir/graph_csv")
    assert(uni.columns.length == 23)
    val hosts = contracted.select("src_host")
      .union(contracted.select("dst_host")).distinct().count()
    import org.apache.spark.sql.functions.col
    assert(uni.where(col("graph_attr") === "Node").count() == hosts)
    assert(uni.where(col("graph_attr") === "Edge").count() == contracted.count())
  }
}
