package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.algo._
import graft.dedup.Dedup

/** Property-based invariants (SURVEY.md §5.2): rank conservation, CC
  * idempotence, LP stability on disjoint cliques, triangle counts vs
  * brute force on random graphs, dedup idempotence, extraction
  * determinism across parallelism. Case counts kept small — every case
  * runs Spark jobs. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic property driver: scalacheck generators sampled from
    * fixed seeds (no scalatestplus bridge in the offline cache; seeded
    * draws also make failures reproducible by construction). */
  private def forAllSeeded[A](gen: Gen[A], cases: Int = 5)(body: A => Unit): Unit =
    (1 to cases).foreach { k =>
      body(gen.pureApply(Gen.Parameters.default, Seed(k.toLong)))
    }

  private val edgeGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(4, 24)
    m <- Gen.choose(n, 4 * n)
    es <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L)
    } yield (a, b))
  } yield es.filter(e => e._1 != e._2)

  test("PageRank ranks sum to ~1 (teleport conservation) on random graphs") {
    forAllSeeded(edgeGen) { es =>
      if (es.nonEmpty) {
        val ranks = PageRank.run(es.toDF("src", "dst"),
          PageRank.Params(tol = 1e-8, maxIter = 60, numPartitions = 4)).state
        val total = ranks.agg(sum("rank")).collect()(0).getDouble(0)
        assert(math.abs(total - 1.0) < 1e-6)
      }
    }
  }

  test("CC idempotence: contracting components and re-running is identity") {
    forAllSeeded(edgeGen) { es =>
      if (es.nonEmpty) {
        val cc = ConnectedComponents.run(es.toDF("src", "dst"), 4).state
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // maximality/idempotence: contracting every component to one vertex
        // leaves NO inter-component edges — running CC again would be the
        // identity on a fully contracted graph
        val contracted = es.map { case (a, b) => (cc(a), cc(b)) }
          .filter(e => e._1 != e._2)
        assert(contracted.isEmpty,
          s"edges crossing component boundaries: $contracted")
        // component labels are canonical minima
        assert(cc.forall { case (id, comp) => comp <= id })
      }
    }
  }

  test("triangle total equals brute force on random graphs") {
    forAllSeeded(edgeGen) { es =>
      if (es.nonEmpty) {
        val und = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
          .distinct
        val adj = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val nodes = und.flatMap(e => Seq(e._1, e._2)).distinct.sorted
        var brute = 0L
        for {
          i <- nodes; j <- adj.getOrElse(i, Set.empty)
          k <- adj.getOrElse(i, Set.empty) if j < k
          if adj.getOrElse(j, Set.empty).contains(k)
        } brute += 1
        val got = TriangleCount.total(es.toDF("src", "dst"), 4)
        assert(got === brute)
      }
    }
  }

  test("LP on disjoint cliques labels each clique by its min vertex") {
    forAllSeeded(Gen.zip(Gen.choose(2, 4), Gen.choose(3, 6)), cases = 3) { case (nCliques, sz) =>
      val es = (0 until nCliques).flatMap { c =>
        val base = c * 100L
        for (i <- 0 until sz; j <- 0 until sz if i < j)
          yield (base + i, base + j)
      }
      val lp = LabelPropagation.run(es.toDF("src", "dst"), 4, maxIter = 10)
        .state.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (0 until nCliques).foreach { c =>
        val base = c * 100L
        (0 until sz).foreach { i =>
          assert(lp(base + i) === base, s"clique $c vertex $i")
        }
      }
    }
  }

  test("prefix-filtered jaccardPairs equals plain-Scala brute force on " +
    "random corpora (exactness + guaranteed recall)") {
    // docs share tokens from a small vocabulary so hub shingles (high
    // document frequency) actually occur — the case the prefix filter
    // must survive without losing recall
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docGen: Gen[Seq[(Long, String)]] = for {
      nDocs <- Gen.choose(8, 20)
      docs <- Gen.sequence[Seq[String], String]((0 until nDocs).map { _ =>
        for {
          len <- Gen.choose(5, 14)
          ws <- Gen.listOfN(len, Gen.oneOf(vocab))
        } yield ws.mkString(" ")
      })
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

    def shingles(t: String, n: Int): Set[String] =
      t.split(" ").sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet

    forAllSeeded(docGen, cases = 4) { docs =>
      val minJ = 0.5 // lower threshold → shorter prefixes → harder case
      val got = Dedup.jaccardPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", n = 2, minJ = minJ)
        .collect()
        .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
          r.getAs[Long]("inter"), r.getAs[Long]("uni"))).toSet
      val sh = docs.map { case (id, t) => id -> shingles(t, 2) }.toMap
      val expect = (for {
        (a, sa) <- sh; (b, sb) <- sh if a < b
        inter = (sa intersect sb).size
        uni = (sa union sb).size
        if uni > 0 && inter.toDouble / uni >= minJ
      } yield (a, b, inter.toLong, uni.toLong)).toSet
      assert(got === expect)
    }
  }

  test("IndirectEdges.build equals a plain-Scala mirror of the reference's " +
    "pandas semantics on random event tables with row multiplicities") {
    // random rows with DELIBERATE duplicates (small domains): the round-4
    // rewrite (distinct-before-join for set_get/set_modify, Σ nx·ny for
    // get_url's raw-pair count) must be invisible at any multiplicity mix
    val rowGen: Gen[(Long, String, String, String, String, String, String)] = for {
      v <- Gen.choose(0L, 1L)
      kind <- Gen.choose(0, 4)
      s <- Gen.choose(0, 3)
      k <- Gen.choose(0, 2)
      c <- Gen.choose(0, 3)
      t <- Gen.choose(0, 9)
    } yield {
      val ts = f"$t%010d"
      kind match {
        case 0 => (v, s"s$s", s"k$k", "set_js",
          s"""{"value":"val${c}XYZ"}""", null, ts)
        case 1 => (v, s"g$s", s"k$k", "get_js", null, null, ts)
        case 2 => (v, s"r$s", s"k$k", "remove_storage_js", null, null, ts)
        case 3 => (v, s"u$s", s"m$k", "N/A", null,
          s"""[["Cookie","t=val${c}XYZ"]]""", ts)
        case 4 => (v, s"m$k", s"http://t$s.com/?q=val${c}XYZ", "N/A", null,
          """[["A","x"]]""", ts)
      }
    }
    val tableGen: Gen[List[(Long, String, String, String, String, String, String)]] =
      Gen.choose(25, 60).flatMap(m => Gen.listOfN(m, rowGen))

    val setA = Set("set", "set_js", "set_storage_js")
    val getA = Set("get", "get_js", "get_storage_js")
    def cv(attr: String): Option[String] =
      Option(attr).flatMap("\"value\":\"([^\"]*)\"".r
        .findFirstMatchIn(_).map(_.group(1)))

    forAllSeeded(tableGen, cases = 3) { rows =>
      val df = rows.toDF("visit_id", "src", "dst", "action", "attr",
        "reqattr", "time_stamp")
      val got = graft.features.IndirectEdges.build(df).collect()
        .map(r => (r.getString(4), r.getLong(0), r.getString(1),
          r.getString(2), r.getLong(3)))
        .toSeq.sorted

      // ---- brute force, mirroring utils.py:395-500 over raw rows -------
      val sets = rows.filter(r => setA(r._4)).map(r => (r._1, r._2, r._3))
      val gets = rows.filter(r => getA(r._4)).map(r => (r._1, r._2, r._3))
      val setGet = (for {
        (v, s, d) <- sets; (v2, g, d2) <- gets if v == v2 && d == d2
      } yield (v, s, g, d)).distinct
        .groupBy(t => (t._1, t._2, t._3))
        .map { case ((v, s, g), ks) => ("set_get", v, s, g, ks.size.toLong) }

      val allSets = rows.filter(r => setA(r._4) || r._4 == "remove_storage_js")
      val setModify = allSets.groupBy(r => (r._1, r._3)).toSeq.flatMap {
        case ((v, d), rs) =>
          val sorted = rs.sortBy(r => (r._7, r._2))
          val f = sorted.head._2
          sorted.tail.map(_._2).distinct
            .map(l => ("set_modify", v, f, l, 1L))
      }

      val targets = rows.filter(r => r._6 != null && r._6 != "CS" &&
        r._6 != "N/A").map(r => (r._1, r._3)).distinct
      val values = rows.filter(r => Set("set", "set_js")(r._4))
        .flatMap(r => cv(r._5).map(c => (r._1, c, r._2)))
        .filter(_._2.length > 3)
        .groupBy(t => (t._1, t._2))
        .map { case ((v, c), rs) => (v, c, rs.map(_._3).min) }
      val setUrl = (for {
        (v, c, s) <- values.toSeq; (v2, u) <- targets if v == v2
        if graft.features.IndirectEdges.cookieValueInUrl(c, u)
      } yield (v, s, u)).groupBy(identity)
        .map { case ((v, s, u), ms) => ("set_url", v, s, u, ms.size.toLong) }

      val http = rows.filter(r => r._6 != "CS" && r._2 != "N/A" &&
        r._4 != "CS")
      val getUrl = (for {
        x <- http if x._6 != null
        y <- http if x._1 == y._1 && x._3 == y._2
        if graft.features.IndirectEdges.cookiePresence(x._6, y._3)
      } yield (x._1, x._2, y._3)).groupBy(identity)
        .map { case ((v, s, d), ps) => ("get_url", v, s, d, ps.size.toLong) }

      val expect =
        (setGet ++ setModify ++ setUrl ++ getUrl).toSeq.sorted
      assert(got === expect)
    }
  }

  test("dedup idempotence: minHashLsh on an already-deduped corpus is empty") {
    val texts = (0 until 25).map { i =>
      (i.toLong, (0 until 30).map(j =>
        s"w${graft.core.Hashing.bounded(graft.core.Hashing.h(5L, i, j), 500)}")
        .mkString(" "))
    }
    val d = texts.toDF("doc_id", "text")
    val pairs = Dedup.minHashLsh(d, "doc_id", "text", n = 3, k = 64,
      bands = 16, minJ = 0.8).collect()
    assert(pairs.isEmpty)
  }

  test("distances equals plain-Scala BFS on random multi-visit digraphs " +
    "(directed and undirected)") {
    // guards the fused directed+undirected expansion: both slices of the
    // tagged loop must equal an independent per-visit BFS, including the
    // per-level anti-join semantics on dist ties
    def refBfs(es: Seq[(Long, Long)], undirected: Boolean): Set[(Long, Long, Int)] = {
      val adj = (if (undirected) es ++ es.map(e => (e._2, e._1)) else es)
        .filter(e => e._1 != e._2).distinct
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val verts = es.flatMap(e => Seq(e._1, e._2)).distinct
      verts.flatMap { s =>
        val dist = scala.collection.mutable.Map(s -> 0)
        var frontier = Seq(s)
        var d = 0
        while (frontier.nonEmpty) {
          d += 1
          val next = frontier.flatMap(v => adj.getOrElse(v, Nil))
            .distinct.filterNot(dist.contains)
          next.foreach(w => dist(w) = d)
          frontier = next
        }
        dist.map { case (v, dd) => (s, v, dd) }
      }.toSet
    }
    forAllSeeded(edgeGen, cases = 4) { es =>
      if (es.nonEmpty) {
        // two visits sharing the engine call: visit 1 = es, visit 2 = reversed
        val df = (es.map(e => (1L, e._1.toString, e._2.toString)) ++
          es.map(e => (2L, e._2.toString, e._1.toString)))
          .toDF("visit_id", "src", "dst")
        def got(undirected: Boolean) = graft.features.GraphMetrics
          .distances(df, undirected)
          .collect()
          .map(r => (r.getLong(0), r.getString(1).toLong, r.getString(2).toLong,
            r.getInt(3))).toSet
        def want(undirected: Boolean) =
          refBfs(es, undirected).map { case (s, v, d) => (1L, s, v, d) } ++
            refBfs(es.map(e => (e._2, e._1)), undirected)
              .map { case (s, v, d) => (2L, s, v, d) }
        assert(got(false) === want(false))
        assert(got(true) === want(true))
      }
    }
  }

  test("edge extraction is byte-identical across parallelism levels") {
    val p1 = graft.sources.PagesGen.generate(spark, 8, 8, 42L, 1)
    val p8 = graft.sources.PagesGen.generate(spark, 8, 8, 42L, 8)
    def edgeSet(p: org.apache.spark.sql.Dataset[graft.model.Page]) =
      graft.graphbuild.EdgeBuilder.edges(graft.graphbuild.EdgeBuilder.links(p))
        .select("src_id", "dst_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edgeSet(p1) === edgeSet(p8))
  }
}
