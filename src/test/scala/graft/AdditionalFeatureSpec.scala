package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.features.{AdditionalFeatures, GraphMetrics}

/** Goldens for the reference's "additional" feature families
  * (/root/reference/code/features/additional.py) and the script-content
  * features (structure.py:8-64) — hand-computed on micro fixtures,
  * including the parity quirks: the substring "N/A" gate, 'none'-valued
  * cookie size 0, python filter(None) dropping clength 0, NaN != "N/A"
  * passing null respattr, and python != null-comparison semantics for the
  * diff-domain counts. */
class AdditionalFeatureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cookieStats: sizes, 'none' zeroing, httponly, diff-domain") {
    val nodes = Seq((1L, "S", "s.example"))
      .toDF("visit_id", "name", "top_level_domain")
    val edges = Seq(
      (1L, "S", """{"name":"ab","value":"xyz1"}""", "set"),
      (1L, "S", """{"name":"long","value":"None"}""", "set_js"),
      (1L, "S", """{"name":"c","value":"v","httponly":true,"domain":".other.example"}""", "set"),
      (1L, "S", "N/A", "set"), // substring gate skips the row
      (1L, "S", """{"name":"d","value":"v2","domain":".s.example"}""", "set"),
      (1L, "S", """{"name":"noval6"}""", "set"), // python partial append:
      // size_name recorded BEFORE the KeyError on the missing value
      (1L, "S", """{"name":"zz","value":"zzzzzz"}""", "get"), // wrong action
      (1L, "T", """{"name":"only"}""", "set"), // value-less ONLY → all −1
      // NaN top_level_domain parity (additional.py:139-143): U is absent
      // from the node table; the reference's NaN TLD compares unequal to
      // the cookie domain and INCREMENTS num_diff_domain
      (1L, "U", """{"name":"u","value":"v","domain":".any.example"}""", "set")
    ).toDF("visit_id", "src", "attr", "action")
    val m = AdditionalFeatures.cookieStats(edges, nodes).collect()
      .map(x => x.getAs[String]("name") -> x).toMap
    val r = m("S")
    assert(r.getAs[Int]("max_size_name") === 6) // "noval6" counts
    assert(r.getAs[Int]("min_size_name") === 1)
    assert(r.getAs[Double]("mean_size_name") === 2.8) // (2+4+1+1+6)/5
    assert(r.getAs[Int]("max_size_val") === 4)
    assert(r.getAs[Int]("min_size_val") === 0) // "None" value zeroed
    assert(r.getAs[Double]("mean_size_val") === 1.75)
    assert(r.getAs[Long]("num_httponly") === 1L)
    assert(r.getAs[Long]("num_diff_domain") === 1L) // .other.example only
    // no value-bearing row at all → the reference's both-lists gate keeps
    // every size stat unset
    assert(m("T").isNullAt(m("T").fieldIndex("max_size_name")))
    assert(m("T").isNullAt(m("T").fieldIndex("mean_size_val")))
    assert(m("U").getAs[Long]("num_diff_domain") === 1L) // null TLD counts
  }

  test("responseStats: clength stats, zero-drop, null respattr passes") {
    val edges = Seq(
      (1L, "A", "B", """{"clength":100,"ctype":"text/html"}""", null),
      (1L, "A", "B", """{"clength":0}""", "hdr"), // filter(None) drops 0
      (1L, "A", "C", """{"clength":50}""", "hdr"),
      (1L, "A", "B", "CS", "hdr"), // sentinel attr dropped
      (1L, "A", "B", """{"clength":30}""", "N/A"), // respattr N/A dropped
      (1L, "X", "A", """{"clength":7}""", null)
    ).toDF("visit_id", "src", "dst", "attr", "respattr")
    val m = AdditionalFeatures.responseStats(edges).collect()
      .map(r => r.getAs[String]("name") -> r).toMap
    assert(m("A").getAs[Long]("max_rec_response_length") === 100L)
    assert(m("A").getAs[Long]("min_rec_response_length") === 50L)
    assert(m("A").getAs[Double]("mean_rec_response_length") === 75.0)
    assert(m("A").getAs[Long]("max_size_response") === 7L) // dst side
    assert(m("B").getAs[Long]("max_size_response") === 100L)
    assert(m("B").getAs[Long]("min_size_response") === 100L)
    assert(m("C").getAs[Long]("max_size_response") === 50L)
    // X sent but never received: dst-side stats null (−1 after matrix fill)
    assert(m("X").isNullAt(m("X").fieldIndex("max_size_response")))
  }

  test("edgeCounts: CS rows by either sentinel column + created elements") {
    val edges = Seq(
      (1L, "A", "B", "CS", null, null),
      (1L, "A", "C", null, "CS", null),
      (1L, "A", "E1", null, null, "create"),
      (1L, "B", "C", null, null, "get")
    ).toDF("visit_id", "src", "dst", "reqattr", "attr", "action")
    val m = AdditionalFeatures.edgeCounts(edges).collect()
      .map(r => r.getAs[String]("name") -> r).toMap
    assert(m("A").getAs[Long]("num_cs_edges_sent") === 2L)
    assert(m("A").getAs[Long]("num_created_elements") === 1L)
    assert(m("B").getAs[Long]("num_cs_edges_rec") === 1L)
    assert(m("C").getAs[Long]("num_cs_edges_rec") === 1L)
    assert(m("B").getAs[Long]("num_cs_edges_sent") === 0L)
  }

  test("diffDomainCounts: neighbors/closure vs node domain, python != nulls") {
    val edges = Seq((1L, "A", "B"), (1L, "B", "C"), (1L, "D", "E"))
      .toDF("visit_id", "src", "dst")
    val nodes = Seq(
      (1L, "A", "a.com"), (1L, "B", "b.com"), (1L, "C", null),
      (1L, "D", null), (1L, "E", null) // None != None is False in python
    ).toDF("visit_id", "name", "domain")
    val simple = edges.distinct()
    val dist = GraphMetrics.distances(simple, undirected = false)
    val m = AdditionalFeatures.diffDomainCounts(nodes, simple, dist).collect()
      .map(r => r.getAs[String]("name") -> r).toMap
    assert(m("B").getAs[Long]("num_diff_domain_predecessors") === 1L)
    assert(m("C").getAs[Long]("num_diff_domain_predecessors") === 1L) // b.com vs null
    assert(m("A").getAs[Long]("num_diff_domain_successors") === 1L)
    assert(m("C").getAs[Long]("num_diff_domain_ancestors") === 2L)
    assert(m("A").getAs[Long]("num_diff_domain_descendants") === 2L)
    assert(m("B").getAs[Long]("num_diff_domain_ancestors") === 1L)
    // null-vs-null does NOT differ
    assert(m("E").getAs[Long]("num_diff_domain_predecessors") === 0L)
    assert(m("D").getAs[Long]("num_diff_domain_descendants") === 0L)
  }

  test("distances: deep-diameter path graph, directed and undirected") {
    // 40-hop path in ONE visit — the regime where per-level plans once
    // chained through every previous superstep (O(depth²) live plan
    // nodes); exact pair counts pin the semi-naïve expansion at depth
    val n = 40
    val edges = (0 until n).map(i => (1L, s"n$i", s"n${i + 1}"))
      .toDF("visit_id", "src", "dst")
    val dist = GraphMetrics.distances(edges, undirected = false)
    assert(dist.count() === (n + 1).toLong * (n + 2) / 2) // v≥s pairs only
    assert(dist.where($"s" === "n0" && $"v" === s"n$n").collect()
      .head.getAs[Int]("dist") === n)
    val udist = GraphMetrics.distances(edges, undirected = true)
    assert(udist.count() === (n + 1).toLong * (n + 1)) // all ordered pairs
  }

  test("distances throws loudly past maxIter instead of truncating") {
    val edges = (0 until 6).map(i => (1L, s"n$i", s"n${i + 1}"))
      .toDF("visit_id", "src", "dst")
    val ex = intercept[IllegalStateException] {
      GraphMetrics.distances(edges, undirected = false, maxIter = 3)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("scriptContent: ancestor script bodies via the content table") {
    // page(Script, h2) → S(Script, h1) → N; h1 has function+canvas-fp and
    // is longer; h2 has eval only
    val nodes = Seq(
      (1L, "page", "Script"), (1L, "S", "Script"), (1L, "N", "Request")
    ).toDF("visit_id", "name", "type")
    val edges = Seq(
      (1L, "root", "page", "h2"),
      (1L, "page", "S", "h1"),
      (1L, "S", "N", "N/A")
    ).toDF("visit_id", "src", "dst", "content_hash")
    val content = Seq(
      ("h1", "function f(){return ctx.toDataURL();} // longer body"),
      ("h2", "eval(x)")
    ).toDF("content_hash", "body")
    val dist = GraphMetrics.distances(
      edges.select("visit_id", "src", "dst"), undirected = false)
    val m = AdditionalFeatures.scriptContent(nodes, edges, dist, content)
      .collect().map(r => r.getAs[String]("name") -> r).toMap
    assert(m("N").getAs[Int]("ascendant_script_has_eval_or_function") === 1)
    assert(m("N").getAs[Int]("ascendant_script_has_fp_keyword") === 1)
    assert(m("N").getAs[Int]("ascendant_script_length") ===
      "function f(){return ctx.toDataURL();} // longer body".length)
    // S's only script ancestor is page (h2: eval, no fp keyword, short)
    assert(m("S").getAs[Int]("ascendant_script_has_eval_or_function") === 1)
    assert(m("S").getAs[Int]("ascendant_script_has_fp_keyword") === 0)
    assert(m("S").getAs[Int]("ascendant_script_length") === "eval(x)".length)
    assert(!m.contains("page")) // root isn't a Script: no row
  }
}
