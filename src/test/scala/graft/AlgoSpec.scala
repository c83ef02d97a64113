package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.algo._

/** Golden tests for the iterative algorithms against plain-Scala reference
  * implementations computed in-test on micro graphs (SURVEY.md §5.2):
  * PageRank allclose 1e-6, components/labels/triangles exact. */
class AlgoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edgeDf(es: Seq[(Long, Long)]): DataFrame =
    es.toDF("src", "dst")

  // ---- plain-Scala reference PageRank (dangling-aware, synchronous) ----
  private def refPageRank(es: Seq[(Long, Long)], d: Double, iters: Int): Map[Long, Double] = {
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val out = es.distinct.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var rank = nodes.map(_ -> 1.0 / n).toMap
    (0 until iters).foreach { _ =>
      val dangling = nodes.filter(v => !out.contains(v)).map(rank).sum
      val contrib = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
      out.foreach { case (u, vs) =>
        val c = rank(u) / vs.size
        vs.foreach(v => contrib(v) += c)
      }
      rank = nodes.map(v => v -> ((1 - d) / n + d * (contrib(v) + dangling / n))).toMap
    }
    rank
  }

  test("PageRank matches plain-Scala reference to 1e-6 (star + chain + dangling)") {
    // star into a hub + a chain + a dangling sink
    val es: Seq[(Long, Long)] = Seq(
      1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L, // star into 0
      0L -> 5L, 5L -> 6L, 6L -> 7L,           // chain; 7 dangling
      3L -> 4L, 4L -> 3L)                     // 2-cycle
    val got = PageRank.run(edgeDf(es),
      PageRank.Params(tol = 1e-9, maxIter = 200, numPartitions = 4))
      .state.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPageRank(es, 0.85, 200)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-6, s"vertex $k: $v vs ${want(k)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-6) // teleport-conserving
  }

  // plain-Scala personalized reference: teleport AND dangling mass land on
  // the normalized seed vector (networkx pagerank(personalization=…))
  private def refPpr(es: Seq[(Long, Long)], seeds: Set[Long], d: Double,
                     iters: Int): Map[Long, Double] = {
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val p = nodes.map(v => v -> (if (seeds(v)) 1.0 / seeds.size else 0.0)).toMap
    val out = es.distinct.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var rank = nodes.map(_ -> 1.0 / n).toMap
    (0 until iters).foreach { _ =>
      val dangling = nodes.filter(v => !out.contains(v)).map(rank).sum
      val contrib = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
      out.foreach { case (u, vs) =>
        val c = rank(u) / vs.size
        vs.foreach(v => contrib(v) += c)
      }
      rank = nodes.map(v => v -> ((1 - d) * p(v) + d * (contrib(v) + dangling * p(v)))).toMap
    }
    rank
  }

  test("personalized PageRank matches plain-Scala reference; uniform reset ≡ classic") {
    val es: Seq[(Long, Long)] = Seq(
      1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      0L -> 5L, 5L -> 6L, 6L -> 7L,
      3L -> 4L, 4L -> 3L,
      8L -> 9L) // a side component the seeds can't reach
    val seeds = Set(0L, 5L)
    val seedDf = seeds.toSeq.map(_ -> 1.0).toDF("id", "p")
    val got = PageRank.run(edgeDf(es),
      PageRank.Params(tol = 1e-12, maxIter = 200, numPartitions = 4),
      reset = Some(seedDf))
      .state.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPpr(es, seeds, 0.85, 300)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-9, s"vertex $k: $v vs ${want(k)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-9) // mass conserved
    // unreachable-from-seeds, teleport-weight-0 vertices converge to 0
    assert(got(8L) < 1e-12 && got(9L) < 1e-12)

    // uniform personalization over ALL vertices == classic PageRank
    val all = es.flatMap(e => Seq(e._1, e._2)).distinct
    val uni = PageRank.run(edgeDf(es),
      PageRank.Params(tol = 1e-12, maxIter = 200, numPartitions = 4),
      reset = Some(all.map(_ -> 1.0).toDF("id", "p")))
      .state.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val classic = PageRank.run(edgeDf(es),
      PageRank.Params(tol = 1e-12, maxIter = 200, numPartitions = 4))
      .state.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // (1-d)*(1/n) vs (1-d)/n can differ in the last ulp per step — compare
    // at fixpoint tolerance, not bitwise
    uni.foreach { case (k, v) =>
      assert(math.abs(v - classic(k)) < 1e-9, s"uniform≠classic at $k")
    }
  }

  test("personalized PageRank requires positive seed mass on the graph") {
    val es: Seq[(Long, Long)] = Seq(0L -> 1L, 1L -> 0L)
    val offGraph = Seq(99L -> 1.0).toDF("id", "p") // no overlap with vertices
    intercept[IllegalArgumentException] {
      PageRank.run(edgeDf(es), PageRank.Params(maxIter = 5, numPartitions = 4),
        reset = Some(offGraph))
    }
  }

  test("PageRank converges and reports steps") {
    val es = (0L until 20L).map(i => i -> ((i + 1) % 20)) // ring: uniform ranks
    val res = PageRank.run(edgeDf(es), PageRank.Params(tol = 1e-8, numPartitions = 4))
    val ranks = res.state.collect().map(_.getDouble(1))
    ranks.foreach(r => assert(math.abs(r - 1.0 / 20) < 1e-7))
    assert(res.steps >= 1 && res.metrics.nonEmpty)
  }

  test("connected components: rings, chain, isolated pair — exact min-id labels") {
    // component A: ring 0-4; component B: chain 10-15; component C: edge 20-21
    val es: Seq[(Long, Long)] =
      (0L until 5L).map(i => i -> ((i + 1) % 5)) ++
        (10L until 15L).map(i => i -> (i + 1)) ++ Seq(20L -> 21L)
    val got = ConnectedComponents.run(edgeDf(es), numPartitions = 4)
      .state.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 5L).foreach(v => assert(got(v) == 0L))
    (10L to 15L).foreach(v => assert(got(v) == 10L))
    assert(got(20L) == 20L && got(21L) == 20L)
  }

  test("connected components on a long chain (pointer jumping beats diameter)") {
    val nChain = 200L
    val es = (0L until nChain).map(i => i -> (i + 1))
    val res = ConnectedComponents.run(edgeDf(es), numPartitions = 4, maxIter = 50)
    val comps = res.state.collect().map(_.getLong(1)).distinct
    assert(comps.toSeq == Seq(0L))
    assert(res.steps < 25, s"took ${res.steps} supersteps for diameter 200")
  }

  test("label propagation: two disjoint cliques converge to min-id labels") {
    def clique(ids: Seq[Long]): Seq[(Long, Long)] =
      for { a <- ids; b <- ids if a < b } yield a -> b
    val es = clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L))
    val got = LabelPropagation.run(edgeDf(es), numPartitions = 4, maxIter = 20)
      .state.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(1L, 2L, 3L, 4L).foreach(v => assert(got(v) == 1L, s"v=$v got=${got(v)}"))
    Seq(10L, 11L, 12L, 13L).foreach(v => assert(got(v) == 10L))
  }

  // ---- brute-force triangle reference ----
  private def refTriangles(es: Seq[(Long, Long)]): (Map[Long, Long], Long) = {
    val und = es.flatMap(e => Seq(e, e.swap)).filter(e => e._1 != e._2).toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val per = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    var total = 0L
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size; k <- (j + 1) until nodes.size
      a = nodes(i); b = nodes(j); c = nodes(k)
      if und((a, b)) && und((b, c)) && und((a, c))
    } {
      total += 1; per(a) += 1; per(b) += 1; per(c) += 1
    }
    (nodes.map(v => v -> per(v)).toMap, total)
  }

  test("triangle count exact vs brute force on seeded random graph") {
    val es = (0 until 300).map { i =>
      val a = graft.core.Hashing.bounded(graft.core.Hashing.h(7L, i, 1), 30).toLong
      val b = graft.core.Hashing.bounded(graft.core.Hashing.h(7L, i, 2), 30).toLong
      a -> b
    }.filter(e => e._1 != e._2)
    val (wantPer, wantTotal) = refTriangles(es)
    val (gotPerDf, gotTotal) = TriangleCount.perVertexAndTotal(edgeDf(es), 4)
    assert(gotTotal == wantTotal)
    val gotPer = gotPerDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotPer == wantPer)
  }

  test("triangle count: K4 has 4 triangles, each vertex in 3") {
    val es = for { a <- 0L until 4L; b <- 0L until 4L if a < b } yield a -> b
    val (per, total) = TriangleCount.perVertexAndTotal(edgeDf(es), 4)
    assert(total == 4L)
    per.collect().foreach(r => assert(r.getLong(1) == 3L))
  }

  test("PageRank on an empty edge table returns an empty result, no crash") {
    // reachable from streaming first/empty micro-batches
    val res = PageRank.run(Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(res.state.count() === 0L && res.steps === 0)
  }

  test("BFS deduplicates seed rows (no duplicate state fan-out)") {
    val e = edgeDf(Seq(1L -> 2L, 2L -> 3L))
    val seeds = Seq(1L, 1L, 1L).toDF("id") // duplicated on purpose
    val out = Bfs.run(e, seeds, numPartitions = 4).state.collect()
    assert(out.length === 3) // one row per vertex, not 3x for vertex 1
    assert(out.map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("closure reflexive=false keeps cycle self-reachability and throws " +
    "on maxIter truncation") {
    // 1 -> 2 -> 1 cycle + a tail 2 -> 3: every cycle member reaches itself
    val e = edgeDf(Seq(1L -> 2L, 2L -> 1L, 2L -> 3L))
    val pairs = Reachability.closure(e, reflexive = false, numPartitions = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 1L)) && pairs.contains((2L, 2L)))
    assert(!pairs.contains((3L, 3L))) // 3 has no outgoing path to itself
    assert(pairs.contains((1L, 3L)))
    // a chain longer than maxIter must fail loudly, not silently truncate
    val chain = edgeDf((0L until 10L).map(i => i -> (i + 1)))
    val ex = intercept[IllegalStateException] {
      Reachability.closure(chain, numPartitions = 4, maxIter = 3).count()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("closure handles a deep chain (depth near maxIter) exactly") {
    // 50-edge path: pins the large-diameter regime where loop-carried
    // plans once chained O(depth²) live nodes (pre-truncation this OOM'd
    // an 8 GB driver at sf0.001 on plan trees, not data)
    val n = 50L
    val chain = edgeDf((0L until n).map(i => i -> (i + 1)))
    val cnt = Reachability.closure(chain, numPartitions = 4, maxIter = 64)
      .count()
    assert(cnt === (n + 1) * (n + 2) / 2)
  }

  test("BFS distances + unreachable sentinel -1") {
    val es: Seq[(Long, Long)] = Seq(0L -> 1L, 1L -> 2L, 2L -> 3L, 9L -> 8L)
    val src = Seq(0L).toDF("id")
    val got = Bfs.run(edgeDf(es), src, undirected = false, numPartitions = 4)
      .state.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == 0 && got(1L) == 1 && got(2L) == 2 && got(3L) == 3)
    assert(got(9L) == -1 && got(8L) == -1)
    // undirected: everything in component reachable
    val got2 = Bfs.run(edgeDf(es), src, undirected = true, numPartitions = 4)
      .state.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2(3L) == 3 && got2(8L) == -1)
  }
}
