package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.GraphStats

/** Golden tests for the one-shot whole-graph statistics (GraphStats)
  * against plain-Scala references on micro graphs, same protocol as
  * AlgoSpec: nx semantics (clustering 2T/d(d-1), Newman Q decomposition,
  * degree_assortativity_coefficient over edge stubs). */
class GraphStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edgeDf(es: Seq[(Long, Long)]): DataFrame = es.toDF("src", "dst")

  // two triangles bridged by one edge, plus a duplicate, a reversed
  // duplicate, and a self-loop — exercises the simplification path
  private val es: Seq[(Long, Long)] = Seq(
    1L -> 2L, 2L -> 3L, 1L -> 3L,     // triangle A
    3L -> 4L,                         // bridge
    4L -> 5L, 5L -> 6L, 4L -> 6L,     // triangle B
    2L -> 1L, 1L -> 2L,               // dup + reversed dup of 1-2
    7L -> 7L)                         // self-loop: vertex 7 must vanish

  private val und: Set[(Long, Long)] = es.collect {
    case (a, b) if a != b => (math.min(a, b), math.max(a, b))
  }.toSet
  private val deg: Map[Long, Int] =
    und.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .view.mapValues(_.size).toMap

  test("clustering matches nx 2T/d(d-1) with simplification (micro)") {
    val got = GraphStats.clustering(edgeDf(es), numPartitions = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L)) // no self-loop vertex
    // triangles per vertex: every vertex is in exactly one triangle
    got.foreach { case (v, (d, t, cc)) =>
      assert(d == deg(v).toLong, s"deg($v)")
      assert(t == 1L, s"tri($v)")
      val want = 2.0 * t / (d * (d - 1.0))
      assert(math.abs(cc - want) < 1e-8, s"cc($v): $cc vs $want")
    }
    assert(math.abs(got(1L)._3 - 1.0) < 1e-8)          // degree-2 in a triangle
    assert(math.abs(got(3L)._3 - 1.0 / 3.0) < 1e-8)    // degree-3, one triangle
  }

  test("clustering gives 0.0 below degree 2") {
    val got = GraphStats.clustering(edgeDf(Seq(1L -> 2L)), numPartitions = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got == Map(1L -> 0.0, 2L -> 0.0))
  }

  test("modularityContrib matches Newman Q decomposition (micro)") {
    val labels = Seq(1L -> 10L, 2L -> 10L, 3L -> 10L,
      4L -> 20L, 5L -> 20L, 6L -> 20L).toDF("id", "label")
    val got = GraphStats.modularityContrib(edgeDf(es), labels)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val m = und.size.toDouble // 7
    // each community: 3 internal edges, total degree 7
    Seq(10L, 20L).foreach { c =>
      val (ec, dc, q) = got(c)
      assert(ec == 3L && dc == 7L, s"community $c: ec=$ec dc=$dc")
      val want = ec / m - math.pow(dc / (2 * m), 2)
      assert(math.abs(q - want) < 1e-8, s"q($c): $q vs $want")
    }
    // global Q = sum of contributions; sanity: bridged 2-clique split is
    // positive and equals 2*(3/7 - 1/4)
    val q = got.values.map(_._3).sum
    assert(math.abs(q - 2 * (3.0 / 7.0 - 0.25)) < 1e-7)
  }

  test("modularityContrib: community with zero internal edges gets ec=0") {
    val labels = Seq(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L,
      6L -> 6L).toDF("id", "label") // singletons: every edge is cross
    val got = GraphStats.modularityContrib(edgeDf(es), labels)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.forall(_ == 0L))
  }

  test("conductance matches nx cut/min(vol, 2m-vol) (micro)") {
    val labels = Seq(1L -> 10L, 2L -> 10L, 3L -> 10L,
      4L -> 20L, 5L -> 20L, 6L -> 20L).toDF("id", "label")
    val got = GraphStats.conductance(edgeDf(es), labels)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val m = und.size // 7
    // one bridge edge (3-4) crosses; each side: cut=1, vol=7, 2m-vol=7
    Seq(10L, 20L).foreach { c =>
      val (cut, vol, phi) = got(c)
      assert(cut == 1L && vol == 7L, s"community $c: cut=$cut vol=$vol")
      val want = cut.toDouble / math.min(vol.toDouble, 2.0 * m - vol)
      assert(math.abs(phi - want) < 1e-8, s"phi($c): $phi vs $want")
    }
  }

  test("conductance: whole-graph community has cut=0 and phi=0") {
    val labels = Seq(1L, 2L, 3L, 4L, 5L, 6L).map(_ -> 99L).toDF("id", "label")
    val got = GraphStats.conductance(edgeDf(es), labels).collect()
    assert(got.length == 1)
    val r = got.head
    // vol = 2m, so min(vol, 2m-vol) = 0 → degenerate denominator → 0.0
    assert(r.getLong(1) == 0L && r.getLong(2) == 2L * und.size &&
      r.getDouble(3) == 0.0)
  }

  test("assortativity matches plain-Scala Pearson over stubs (micro)") {
    val stubs = und.toSeq.flatMap(e => Seq((e._1, e._2), (e._2, e._1)))
    val xs = stubs.map(s => deg(s._1).toDouble)
    val ys = stubs.map(s => deg(s._2).toDouble)
    val n = xs.size.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sx2 = xs.map(a => a * a).sum
    val sy2 = ys.map(a => a * a).sum
    val want = (n * sxy - sx * sy) /
      math.sqrt((n * sx2 - sx * sx) * (n * sy2 - sy * sy))
    val row = GraphStats.assortativity(edgeDf(es)).collect().head
    assert(row.getLong(0) == stubs.size.toLong)
    assert(math.abs(row.getDouble(1) - want) < 1e-8,
      s"${row.getDouble(1)} vs $want")
  }

  test("assortativity is 0.0 on a regular graph (degenerate variance)") {
    val cycle = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 1L) // all degree 2
    val row = GraphStats.assortativity(edgeDf(cycle)).collect().head
    assert(row.getDouble(1) == 0.0)
  }
}
