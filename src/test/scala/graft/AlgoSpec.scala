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

  // ---- plain-Scala reference SCC: Tarjan-free brute closure (micro only) --
  private def refScc(es: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = es.distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def reach(s: Long): Set[Long] = {
      var seen = Set(s); var frontier = Set(s)
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(v => adj.getOrElse(v, Set.empty)) -- seen
        seen ++= next; frontier = next
      }
      seen
    }
    val r = nodes.map(v => v -> reach(v)).toMap
    nodes.map(v => v -> r(v).filter(u => r(u).contains(v)).min).toMap
  }

  test("SCC: bow-tie (cycle + IN/OUT tendrils + second cycle) exact min-id") {
    // 2-cycle {1,2}, 3-cycle {10,11,12}, DAG tendrils in/out, isolated edge
    val es: Seq[(Long, Long)] = Seq(
      1L -> 2L, 2L -> 1L,                       // SCC {1,2}
      10L -> 11L, 11L -> 12L, 12L -> 10L,       // SCC {10,11,12}
      0L -> 1L, 2L -> 10L, 12L -> 20L,          // IN → core → OUT
      20L -> 21L, 30L -> 31L)                   // pure DAG tail + isolated
    val got = Scc.run(edgeDf(es), numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === refScc(es))
    // spot semantics: singletons are their own SCC
    assert(got(0L) == 0L && got(20L) == 20L && got(21L) == 21L)
    assert(got(1L) == 1L && got(2L) == 1L && got(11L) == 10L)
  }

  test("SCC on seeded random digraph matches brute-force closure") {
    val rnd = new scala.util.Random(42)
    val es = (0 until 300).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).distinct
    val got = Scc.run(edgeDf(es), numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === refScc(es))
  }

  test("SCC: pure DAG chain resolves in few rounds (all singletons)") {
    val chain = edgeDf((0L until 30L).map(i => i -> (i + 1)))
    val got = Scc.run(chain, numPartitions = 4, maxRounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (0L to 30L).map(v => v -> v).toMap)
  }

  // ---- plain-Scala reference coreness: classic sequential peel ----
  private def refCore(es: Seq[(Long, Long)]): Map[Long, Int] = {
    val sym = es.flatMap(e => Seq(e, e.swap)).filter(e => e._1 != e._2).distinct
    var adj = sym.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val core = scala.collection.mutable.Map[Long, Int]()
    var k = 0
    while (adj.nonEmpty) {
      val peel = adj.filter(_._2.size <= k).keySet
      if (peel.isEmpty) k += 1
      else {
        peel.foreach(v => core(v) = k)
        adj = (adj -- peel).view.mapValues(_ -- peel).toMap
      }
    }
    core.toMap
  }

  test("coreness: K5 + pendant + triangle matches sequential peel") {
    val k5 = for (i <- 0L until 5L; j <- 0L until 5L if i < j) yield i -> j
    val es = k5 ++ Seq(0L -> 9L,                  // pendant off the K5: core 1
      20L -> 21L, 21L -> 22L, 22L -> 20L)         // triangle: core 2
    val got = Coreness.run(edgeDf(es), numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === refCore(es))
    assert(got(1L) == 4 && got(9L) == 1 && got(20L) == 2)
  }

  test("coreness on seeded random graph matches sequential peel") {
    val rnd = new scala.util.Random(7)
    val es = (0 until 400).map(_ => (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(e => e._1 != e._2).distinct
    val got = Coreness.run(edgeDf(es), numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === refCore(es))
  }

  test("coreness: histogram and window h-index forms agree (and both match " +
       "the peel) on seeded random graphs") {
    // the histogram form is the hub-safe scale path (per-(dst,value) counts
    // collapse a hub's neighbor list map-side BEFORE the shuffle); the
    // window form is the formula the g13 oracle unrolls — identical output
    // is the equivalence VERDICT r4 #3 asks pinned
    for (seed <- Seq(11, 42)) {
      val rnd = new scala.util.Random(seed)
      val es = (0 until 500).map(_ =>
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter(e => e._1 != e._2).distinct
      val hist = Coreness.run(edgeDf(es), numPartitions = 4, histogram = Some(true))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val win = Coreness.run(edgeDf(es), numPartitions = 4, histogram = Some(false))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(hist === win, s"seed $seed: histogram ≠ window")
      assert(hist === refCore(es), s"seed $seed")
    }
  }

  // ---- plain-Scala reference HITS: L1-normalized power iteration ----
  private def refHits(es: Seq[(Long, Long)], iters: Int): Map[Long, (Double, Double)] = {
    val e = es.filter(p => p._1 != p._2).distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    var h = nodes.map(_ -> 1.0).toMap
    var a = Map.empty[Long, Double]
    (1 to iters).foreach { _ =>
      val ar = nodes.map(v => v -> e.filter(_._2 == v).map(p => h(p._1)).sum).toMap
      val at = ar.values.sum
      a = ar.view.mapValues(x => if (at > 0) x / at else x).toMap
      val hr = nodes.map(v => v -> e.filter(_._1 == v).map(p => a(p._2)).sum).toMap
      val ht = hr.values.sum
      h = hr.view.mapValues(x => if (ht > 0) x / ht else x).toMap
    }
    nodes.map(v => v -> (h(v), a(v))).toMap
  }

  test("HITS: star + chain matches plain-Scala power iteration to 1e-9") {
    val es: Seq[(Long, Long)] = Seq(
      1L -> 0L, 2L -> 0L, 3L -> 0L,   // 0 is the authority; 1-3 hubs
      0L -> 4L, 4L -> 5L)             // chain out
    val got = Hits.run(edgeDf(es), iters = 20, numPartitions = 4)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val want = refHits(es, 20)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (hv, av)) =>
      assert(math.abs(hv - want(k)._1) < 1e-9, s"hub $k")
      assert(math.abs(av - want(k)._2) < 1e-9, s"auth $k")
    }
    // structural facts: 1,2,3 are the dominant hubs; 0 the dominant authority
    assert(got(1L)._1 == got(2L)._1 && got(2L)._1 == got(3L)._1)
    assert(got(0L)._2 > got(4L)._2 && got(0L)._2 > got(5L)._2)
    // L1-normalized each half-step
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-9)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-9)
  }

  test("HITS on seeded random digraph matches reference; no leaked blocks") {
    val rnd = new scala.util.Random(11)
    val es = (0 until 250).map(_ => (rnd.nextInt(35).toLong, rnd.nextInt(35).toLong))
      .filter(e => e._1 != e._2).distinct
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val res = Hits.run(edgeDf(es), iters = 15, numPartitions = 4)
    val got = res.collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val want = refHits(es, 15)
    got.foreach { case (k, (hv, av)) =>
      assert(math.abs(hv - want(k)._1) < 1e-9)
      assert(math.abs(av - want(k)._2) < 1e-9)
    }
    graft.core.Checkpoints.release(res)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"Hits leaked persistent RDDs: ${(after -- before).mkString(",")}")
  }

  // ---- plain-Scala reference k-truss: synchronous peel to fixpoint ----
  private def refKTruss(es: Seq[(Long, Long)], k: Int): Map[(Long, Long), Long] = {
    var edges = es.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .filter(e => e._1 != e._2).distinct.toSet
    def supports(s: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      val verts = s.flatMap(e => Seq(e._1, e._2))
      s.map { case (a, b) =>
        val cnt = verts.count(w => w != a && w != b &&
          s.contains((math.min(a, w), math.max(a, w))) &&
          s.contains((math.min(b, w), math.max(b, w))))
        (a, b) -> cnt.toLong
      }.toMap
    }
    var sup = supports(edges)
    var changed = true
    while (changed) {
      val kept = edges.filter(e => sup(e) >= k - 2)
      changed = kept.size != edges.size
      edges = kept
      sup = supports(edges)
    }
    sup
  }

  test("k-truss: overlapping cliques + tail matches sequential peel; " +
       "chordless cycle peels to empty") {
    // K5 on 0-4, K4 on 4-7 sharing vertex 4, a tail 7→8→9, and a chordless
    // 4-cycle 10-13 (every edge in 0 triangles → gone in round 1)
    val k5 = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val k4 = for (i <- 4L to 7L; j <- (i + 1) to 7L) yield (i, j)
    val es = k5 ++ k4 ++ Seq((7L, 8L), (8L, 9L),
      (10L, 11L), (11L, 12L), (12L, 13L), (10L, 13L))
    val got = KTruss.run(edgeDf(es), k = 4, numPartitions = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = refKTruss(es, 4)
    assert(got == want)
    // K5 edges survive with support 3 within K5; K4 edges with support 2;
    // tail and chordless cycle are peeled
    assert(got((0L, 1L)) == 3L && got((5L, 6L)) == 2L)
    assert(!got.contains((7L, 8L)) && !got.contains((10L, 11L)))
    // a 5-truss keeps only the K5 (K4 edges have support 2 < 3)
    val got5 = KTruss.run(edgeDf(es), k = 5, numPartitions = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got5 == k5.toSet)
  }

  test("k-truss on seeded random graph matches sequential peel; " +
       "all-peeled graph returns empty") {
    val rnd = new scala.util.Random(23)
    val es = (0 until 300).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).distinct
    val got = KTruss.run(edgeDf(es), k = 5, numPartitions = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == refKTruss(es, 5))
    // a bare triangle has support 1 per edge: 4-truss empty, 3-truss keeps it
    val tri = Seq((0L, 1L), (1L, 2L), (0L, 2L))
    assert(KTruss.run(edgeDf(tri), k = 4, numPartitions = 4).count() == 0L)
    assert(KTruss.run(edgeDf(tri), k = 3, numPartitions = 4).count() == 3L)
  }

  test("k-truss support enumeration rides the (deg, id)-oriented wedge join " +
       "— hub-safe, not id-oriented (VERDICT r4 #1)") {
    import org.apache.spark.sql.functions.{col, least, greatest}
    // star with the hub at id 0: id-orientation would give the hub oriented
    // out-degree 40 (C(40,2) wedges); degree-orientation points every edge
    // leaf→hub, so no vertex fans out more than once
    val star = (1L to 40L).map(leaf => (0L, leaf))
    val und = edgeDf(star).select(
      least(col("src"), col("dst")).cast("long").as("a"),
      greatest(col("src"), col("dst")).cast("long").as("b"))
    val deg = und.select(col("a").as("id"))
      .union(und.select(col("b").as("id")))
      .groupBy("id").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("deg"))
    val maxOut = TriangleCount.orient(und, deg)
      .groupBy("u").count().agg(org.apache.spark.sql.functions.max("count"))
      .collect()(0).getLong(0)
    assert(maxOut == 1L,
      s"star hub must have oriented out-degree 0 (leaves 1), saw fan-out $maxOut")
    // plan pin: the wedge input carries the degree annotation — the
    // enumeration composes TriangleCount.orient (vdeg column present in the
    // analyzed plan), not a bare id-ordered self-join
    val plan = KTruss.supportEnumeration(und, 4).queryExecution.analyzed.toString
    assert(plan.contains("vdeg"), "support enumeration lost the degree-oriented wedge shape")
    // and the enumeration itself is correct: K4 → every edge in 2 triangles
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val undK4 = edgeDf(k4).select(col("src").as("a"), col("dst").as("b"))
    val sup = KTruss.supportEnumeration(undK4, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(sup.size == 6 && sup.values.forall(_ == 2L))
  }

  // ---- plain-Scala reference link prediction --------------------------
  private def refLinkPred(es: Seq[(Long, Long)], topK: Int)
      : Seq[(Long, Long, Long, Double, Double, Int)] = {
    val und = es.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .filter(e => e._1 != e._2).distinct.toSet
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set.empty)
    und.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    val verts = adj.keys.toSeq.sorted
    val cands = for {
      a <- verts; b <- verts if a < b && !und.contains((a, b))
      common = adj(a) & adj(b) if common.nonEmpty
    } yield {
      val cn = common.size.toLong
      val aa = common.toSeq.map(z => 1.0 / math.log(adj(z).size.toDouble)).sum
      val jc = cn.toDouble / (adj(a).size + adj(b).size - cn)
      (a, b, cn, aa, jc)
    }
    cands.sortBy(c => (-c._3, c._1, c._2)).take(topK).zipWithIndex
      .map { case ((a, b, cn, aa, jc), i) => (a, b, cn, aa, jc, i + 1) }
  }

  test("link prediction matches plain-Scala reference on seeded random graph") {
    val rnd = new scala.util.Random(7)
    val es = (0 until 220).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2).distinct
    val got = LinkPrediction.run(edgeDf(es), topK = 50, numPartitions = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getInt(5)))
      .sortBy(t => t._6)
    val want = refLinkPred(es, 50)
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert((g._1, g._2, g._3, g._6) == ((w._1, w._2, w._3, w._6)), s"$g vs $w")
      assert(math.abs(g._4 - w._4) < 1e-9, s"aa: $g vs $w")
      assert(math.abs(g._5 - w._5) < 1e-9, s"jaccard: $g vs $w")
    }
    // existing edges never predicted
    val undSet = es.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    got.foreach(g => assert(!undSet.contains((g._1, g._2))))
  }

  test("link prediction: path graph a-z-b predicts exactly (a,b)") {
    // 0-1-2: only non-adjacent pair with a shared neighbor is (0,2);
    // z=1 has degree 2 → aa = 1/ln 2, jaccard = 1/1
    val got = LinkPrediction.run(edgeDf(Seq((0L, 1L), (1L, 2L))), topK = 10,
      numPartitions = 4).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((0L, 2L, 1L)))
    assert(math.abs(r.getDouble(3) - 1.0 / math.log(2.0)) < 1e-12)
    // no forced broadcast anywhere in the plan: the degree tables are
    // |V|-sized (scale with the graph) and must join by key, AQE deciding
    // the physical strategy (VERDICT r4 #2; the GraphStats rule). A
    // broadcast() hint would survive analysis as a ResolvedHint node.
    val hintFree = LinkPrediction.run(edgeDf(Seq((0L, 1L), (1L, 2L))),
      topK = 10, numPartitions = 4).queryExecution.analyzed.toString
    assert(!hintFree.contains("ResolvedHint") && !hintFree.contains("UnresolvedHint"),
      "LinkPrediction must not broadcast-hint |V|-sized tables")
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-12)
  }

  // ---- plain-Scala reference deterministic walks ----------------------
  private def md5Draw(walker: Long, step: Int, dst: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${walker}_${step}_$dst".getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  private def refWalks(es: Seq[(Long, Long)], seeds: Seq[Long],
                       length: Int): Set[(Long, Int, Long)] = {
    val out = es.distinct.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    seeds.flatMap { s =>
      var node = s
      var alive = true
      (0 to length).flatMap { k =>
        if (k == 0) Seq((s, 0, s))
        else if (!alive) Seq.empty
        else out.get(node) match {
          case Some(ns) =>
            node = ns.minBy(d => (md5Draw(s, k, d), d))
            Seq((s, k, node))
          case None => alive = false; Seq.empty
        }
      }
    }.toSet
  }

  // ---- plain-Scala reference WEIGHTED PageRank (proportional split) ----
  private def refWeightedPageRank(es: Seq[(Long, Long, Double)], d: Double,
                                  iters: Int): Map[Long, Double] = {
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val out = es.groupBy(_._1).view.mapValues(ws => ws.map(w => (w._2, w._3))).toMap
    val outW = out.view.mapValues(_.map(_._2).sum).toMap
    var rank = nodes.map(_ -> 1.0 / n).toMap
    (0 until iters).foreach { _ =>
      val dangling = nodes.filter(v => !out.contains(v)).map(rank).sum
      val contrib = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
      out.foreach { case (u, vs) =>
        vs.foreach { case (v, w) => contrib(v) += rank(u) * w / outW(u) }
      }
      rank = nodes.map(v => v -> ((1 - d) / n + d * (contrib(v) + dangling / n))).toMap
    }
    rank
  }

  test("weighted PageRank matches plain-Scala reference; uniform weights ≡ classic") {
    val rnd = new scala.util.Random(31)
    val es = (0 until 180).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(e => e._1 != e._2).distinct
    val wes = es.map { case (a, b) => (a, b, ((a + b) % 5 + 1).toDouble) }
    import spark.implicits._
    val wdf = wes.toDF("src", "dst", "w")
    val got = PageRank.run(wdf,
      PageRank.Params(tol = 1e-10, maxIter = 200, numPartitions = 4,
        weightCol = Some("w")))
      .state.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refWeightedPageRank(wes, 0.85, 200)
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-8, s"vertex $k: $v vs ${want(k)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
    // constant weights: the proportional split IS the uniform split
    val const = es.map { case (a, b) => (a, b, 2.0) }.toDF("src", "dst", "w")
    val gotC = PageRank.run(const,
      PageRank.Params(tol = 1e-12, maxIter = 100, numPartitions = 4,
        weightCol = Some("w")))
      .state.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val classic = PageRank.run(es.toDF("src", "dst"),
      PageRank.Params(tol = 1e-12, maxIter = 100, numPartitions = 4))
      .state.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    gotC.foreach { case (k, v) =>
      assert(math.abs(v - classic(k)) < 1e-10, s"uniform≡classic at $k")
    }
  }

  // ---- plain-Scala reference Brandes betweenness (directed, unnormalized,
  // endpoints excluded, optionally source-restricted) ---------------------
  private def refBetweenness(es: Seq[(Long, Long)],
                             sources: Option[Set[Long]]): Map[Long, Double] = {
    val edges = es.filter(e => e._1 != e._2).distinct
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val bc = scala.collection.mutable.Map[Long, Double]() ++
      verts.map(_ -> 0.0)
    val srcs = sources.map(ss => verts.filter(ss)).getOrElse(verts)
    srcs.foreach { s =>
      // forward BFS with path counts
      val dist = scala.collection.mutable.Map[Long, Int](s -> 0)
      val sigma = scala.collection.mutable.Map[Long, Double](s -> 1.0)
        .withDefaultValue(0.0)
      val order = scala.collection.mutable.ArrayBuffer[Long]()
      var frontier = Seq(s)
      while (frontier.nonEmpty) {
        order ++= frontier
        val nxt = scala.collection.mutable.LinkedHashSet[Long]()
        frontier.foreach { v =>
          out.getOrElse(v, Seq.empty).foreach { w =>
            if (!dist.contains(w)) nxt += w
          }
        }
        // two passes: fix distances first, then accumulate sigma
        nxt.foreach(w => dist(w) = dist(frontier.head) + 1)
        frontier.foreach { v =>
          out.getOrElse(v, Seq.empty).foreach { w =>
            if (dist(w) == dist(v) + 1) sigma(w) += sigma(v)
          }
        }
        frontier = nxt.toSeq
      }
      // backward accumulation in reverse BFS order
      val delta = scala.collection.mutable.Map[Long, Double]()
        .withDefaultValue(0.0)
      order.reverseIterator.foreach { v =>
        out.getOrElse(v, Seq.empty).foreach { w =>
          if (dist.contains(w) && dist(w) == dist.getOrElse(v, -99) + 1)
            delta(v) += sigma(v) / sigma(w) * (1.0 + delta(w))
        }
        if (v != s) bc(v) += delta(v)
      }
    }
    bc.toMap
  }

  test("betweenness matches plain-Scala Brandes on seeded random digraph " +
       "(exact + sampled sources); no leaked blocks") {
    val rnd = new scala.util.Random(17)
    val es = (0 until 200).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2).distinct
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = Betweenness.run(edgeDf(es), None, numPartitions = 4)
    val gotM = got.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refBetweenness(es, None)
    assert(gotM.keySet == want.keySet)
    gotM.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-8, s"vertex $k: $v vs ${want(k)}")
    }
    graft.core.Checkpoints.release(got)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"Betweenness leaked persistent RDDs: ${(after -- before).mkString(",")}")
    // sampled-pivot restriction = same job from fewer sources
    val seeds = (0L to 29L).filter(_ % 4 == 0)
    import spark.implicits._
    val gotS = Betweenness.run(edgeDf(es), Some(seeds.toDF("id")),
      numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val wantS = refBetweenness(es, Some(seeds.toSet))
    gotS.foreach { case (k, v) =>
      assert(math.abs(v - wantS.getOrElse(k, 0.0)) < 1e-8, s"sampled $k")
    }
  }

  test("Brandes–Pich pivot estimator: observed error inside the Hoeffding " +
       "acceptance bound on a golden graph (bound vs observed in BASELINE.md)") {
    import spark.implicits._
    // golden digraph: n = 60 vertices with a hub-skewed in-degree (half the
    // targets land on ids 0-5) so bc has a separated head — the web-graph
    // shape the estimator is for; pivots = every 3rd id (k = 20, the g18
    // convention)
    val rnd = new scala.util.Random(13)
    val es = (0 until 700).map { _ =>
      val src = rnd.nextInt(60).toLong
      val dst = (if (rnd.nextBoolean()) rnd.nextInt(6) else rnd.nextInt(60)).toLong
      (src, dst)
    }.filter(e => e._1 != e._2).distinct
    val exact = Betweenness.run(edgeDf(es), None, numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n = exact.size
    val pivots = (0L until 60L).filter(_ % 3 == 0)
    val k = pivots.size
    val est = Betweenness.estimate(edgeDf(es), pivots.toDF("id"),
      numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(est.keySet == exact.keySet)
    // Hoeffding acceptance bound at failure budget δ = 0.01 union-bounded
    // over all n vertices: ξ = sqrt(ln(2n/δ)/(2k)), |err| ≤ ξ·n·(n−2)
    val xi = math.sqrt(math.log(2.0 * n / 0.01) / (2.0 * k))
    val bound = xi * n * (n - 2.0)
    val errs = exact.keys.map(v => math.abs(est(v) - exact(v)))
    val maxErr = errs.max
    assert(maxErr <= bound,
      f"observed max error $maxErr%.2f exceeds Hoeffding bound $bound%.2f")
    // the bound is loose by design; pin the OBSERVED quality too so a
    // regression in the estimator (not just a catastrophe) fails:
    // mean absolute error stays a small fraction of the mean bc mass
    val meanBc = exact.values.sum / n
    val meanErr = errs.sum / n
    assert(meanErr < 0.5 * meanBc,
      f"mean |err| $meanErr%.2f vs mean bc $meanBc%.2f — estimator degraded")
    // estimator must preserve the head: top-5 exact vertices inside top-10
    // estimated (the ranking use the 100×-scale path depends on)
    val top5 = exact.toSeq.sortBy(-_._2).take(5).map(_._1).toSet
    val top10est = est.toSeq.sortBy(-_._2).take(10).map(_._1).toSet
    assert((top5 -- top10est).isEmpty,
      s"estimator lost head vertices: ${(top5 -- top10est).mkString(",")}")
    // measured numbers recorded in BASELINE.md §betweenness-sampling
    println(f"[brandes-pich] n=$n k=$k xi=$xi%.4f bound=$bound%.1f " +
      f"maxErr=$maxErr%.2f meanErr=$meanErr%.2f meanBc=$meanBc%.2f")
  }

  test("betweenness: directed path + diamond golden values") {
    // path 0→1→2→3: bc(1)=2 (pairs 0→2,0→3 via... plus 1→3 doesn't count 1)
    // precisely: 1 lies on 0→2, 0→3; 2 lies on 0→3, 1→3
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val gotP = Betweenness.run(edgeDf(path), None, numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gotP == Map(0L -> 0.0, 1L -> 2.0, 2L -> 2.0, 3L -> 0.0))
    // diamond 0→{1,2}→3: two equal shortest 0→3 paths, each carrier gets 1/2
    val diamond = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L))
    val gotD = Betweenness.run(edgeDf(diamond), None, numPartitions = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(gotD == Map(0L -> 0.0, 1L -> 0.5, 2L -> 0.5, 3L -> 0.0))
  }

  test("deterministic walks match plain-Scala md5 replay; dead ends stop; " +
       "replay-stable across runs") {
    val rnd = new scala.util.Random(41)
    val es = ((0 until 150).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2) ++ Seq((28L, 31L))).distinct // 31 = dead end
    val seeds = (0L to 31L).filter(_ % 3 == 0)
    val seedDf = seeds.toDF("id")
    val run1 = RandomWalks.run(edgeDf(es), seedDf, length = 6, numPartitions = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(run1 == refWalks(es, seeds, 6))
    // every walker has its step-0 row; steps are gap-free per walker
    seeds.foreach(s => assert(run1.contains((s, 0, s))))
    run1.groupBy(_._1).foreach { case (_, rows) =>
      val steps = rows.map(_._2).toSeq.sorted
      assert(steps == (0 to steps.max))
    }
    val run2 = RandomWalks.run(edgeDf(es), seedDf, length = 6, numPartitions = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(run1 == run2)
  }
}
