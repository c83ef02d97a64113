package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.{ApproxReachability, Reachability}
import graft.ext.GraftExtensions
import graft.norm.Etld1

/** Native expression registration + HLL reachability propagation. */
class ExtAndApproxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("etld1 native expression matches Etld1.ofUrl incl. nulls, in SQL") {
    GraftExtensions.register(spark)
    val urls = Seq(
      "http://a.b.site0.example/p1", "https://x.co.uk/q", "http://single",
      "http://127.0.0.1/x", "HTTP://WWW.Site.COM:80/z", null)
    val got = urls.toDF("url")
      .selectExpr("url", "etld1(url) AS d")
      .collect().map(r => Option(r.getString(0)) -> Option(r.getString(1))).toMap
    urls.foreach { u =>
      assert(got(Option(u)) === Option(Etld1.ofUrl(u)), s"url=$u")
    }
    assert(got(Some("https://x.co.uk/q")) === Some("x.co.uk"))
    assert(got(Some("http://127.0.0.1/x")) === None)
    assert(got(None) === None)
  }

  test("etld1 expression stays codegen'd (no UDF node in the plan)") {
    GraftExtensions.register(spark)
    val plan = Seq("http://a.example/").toDF("url")
      .selectExpr("etld1(url)").queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
  }

  test("two sibling etld1 calls over a NON-NULLABLE string codegen in one " +
    "scope (fresh locals under unbraced nullSafeCodeGen inlining)") {
    GraftExtensions.register(spark)
    // concat of non-nullables is non-nullable → unbraced inlining; a fixed
    // local name would collide across the two calls (codegen fallback off
    // makes the Janino failure loud instead of silently interpreted)
    val df = spark.range(3).select(concat(lit("http://s"),
      col("id").cast("string"), lit(".example.com/p")).as("u1"),
      concat(lit("http://t"), col("id").cast("string"),
        lit(".example.org/q")).as("u2"))
    assert(!df.schema("u1").nullable && !df.schema("u2").nullable)
    val saved = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val got = df.selectExpr("etld1(u1) AS d1", "etld1(u2) AS d2").collect()
      assert(got.length == 3)
      assert(got.map(_.getString(0)).toSet == Set("example.com"))
      assert(got.map(_.getString(1)).toSet == Set("example.org"))
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None    => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("HLL descendant counts equal exact closure on small graphs " +
    "(sparse-mode-exact regime)") {
    val edges = (
      (0L to 9L).map(i => (i, i + 1)) ++        // chain 0..10
        Seq((20L, 21L), (21L, 22L), (22L, 20L)) // 3-cycle
      ).toDF("src", "dst")
    val exact = Reachability.descendantCounts(edges, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = ApproxReachability.descendantCounts(edges, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (id, d) =>
      assert(approx(id) === d, s"vertex $id")
    }
  }

  test("HyperBall closeness/eccentricity equal the exact core on the " +
    "FeatureSpec micro graph (sparse-mode-exact regime)") {
    // A=1 B=2 C=3 D=4 E=5; A→B, B→C, A→C, C→D, E→A — closeness goldens
    // are the networkx-pinned values from FeatureSpec
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (5L, 1L))
      .toDF("src", "dst")
    val hb = graft.algo.HyperBall.run(edges, numPartitions = 4)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    val closeness = Map(1L -> 0.25, 2L -> 1.0 / 3.0, 3L -> 0.5625,
      4L -> 0.5, 5L -> 0.0)
    closeness.foreach { case (id, c) =>
      assert(math.abs(hb(id).getAs[Double]("closeness_approx") - c) < 1e-9,
        s"closeness $id")
    }
    val ancestors = Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 0L)
    ancestors.foreach { case (id, a) =>
      assert(hb(id).getAs[Long]("reach_approx") === a, s"reach $id")
    }
    // harmonic (nx harmonic_centrality, incoming distances):
    // h(1)=1/d(5,1)=1; h(2)=1/d(1,2)+1/d(5,2)=1.5;
    // h(3)=1/1+1/1+1/2=2.5; h(4)=1/1+1/2+1/2+1/3=7/3; h(5)=0
    val harmonic = Map(1L -> 1.0, 2L -> 1.5, 3L -> 2.5, 4L -> 7.0 / 3.0,
      5L -> 0.0)
    harmonic.foreach { case (id, h) =>
      assert(math.abs(hb(id).getAs[Double]("harmonic_approx") - h) < 1e-9,
        s"harmonic $id")
    }
    // undirected eccentricity: symmetrize, compare to the nx goldens
    val sym = edges.union(edges.select(col("dst"), col("src")))
    val hbu = graft.algo.HyperBall.run(sym, numPartitions = 4)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("ecc_approx"))
      .toMap
    assert(hbu === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 3L, 5L -> 3L))
  }
}
