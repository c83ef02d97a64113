package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graphbuild.{CrawlDiff, HostGraph}

/** Incremental re-crawl ranking experiment (BASELINE.md evidence for
  * HostGraph.rankContracted's warm start): build a synthetic crawl, derive
  * a churned second snapshot — link rot, new links, a slice of brand-new
  * hosts, the month-over-month Common-Crawl shape — and compare COLD vs
  * WARM-started host PageRank on the second snapshot: supersteps and wall.
  * The claim under test: re-ranking cost tracks the churn, not the corpus.
  *
  *   runMain graft.tools.Recrawl [sites] [pps] [churnPct] [tol] [cores]
  *
  * Prints one JSON line: corpus/host-graph sizes, the contracted-diff churn
  * profile (g27's operator), and (steps, sec) for cold A / cold B / warm B.
  */
object Recrawl {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sites = args.lift(0).map(_.toInt).getOrElse(20000)
    val pps = args.lift(1).map(_.toInt).getOrElse(50)
    val churn = args.lift(2).map(_.toInt).getOrElse(3)
    val tol = args.lift(3).map(_.toDouble).getOrElse(1e-6)
    val cores = args.lift(4).map(_.toInt).getOrElse(32)

    val spark = SparkSession.builder()
      .appName("graft-recrawl")
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // subset co-partitioning: a child hash-partitioned on a SUBSET of
      // the join keys co-partitions the join (the wg4 redirect assembly
      // pre-partitions its four inputs on (visit_id, old_request_id) and
      // every URL-suffixed join + window reuses that one exchange —
      // PLANS.md wg4 row); engine repartitions are all deliberate
      // high-cardinality keys, so the skew guard the default protects
      // against does not apply
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // ---- snapshot A: the synthetic crawl's url-level simple digraph ----
    val pages = graft.sources.PagesGen.generate(spark, sites, pps, 42L, cores)
    val snapA = graft.graphbuild.EdgeBuilder
      .edges(graft.graphbuild.EdgeBuilder.links(pages))
      .select("src", "dst")
      .localCheckpoint(true)

    // ---- snapshot B: deterministic churn off A ----
    // Three real month-over-month components: `churn`% of links rot away; a
    // similar volume of new links appears, re-targeted from a hash-picked
    // sample — of those, the dst is rewritten either onto one of ~50
    // brand-new hosts (1/3) or onto the sampled page's hub (2/3); and
    // churn/3 % of DOMAINS vanish outright (site offline — the host-pair
    // `removed` rows of the contracted diff).
    graft.ext.GraftExtensions.register(spark)
    val deadHost = (u: org.apache.spark.sql.Column) =>
      pmod(xxhash64(call_function("etld1", u), lit("dead")), lit(300)) <
        churn
    val rotKey = pmod(xxhash64(col("src"), col("dst"), lit("rot")), lit(100))
    val newKey = pmod(xxhash64(col("src"), col("dst"), lit("new")), lit(100))
    val fresh = snapA.where(newKey < churn)
      .select(col("src"),
        when(pmod(xxhash64(col("dst")), lit(3)) === 0,
          concat(lit("http://fresh"), pmod(xxhash64(col("dst")), lit(50)),
            lit(".example/p0")))
          .otherwise(concat(lit("http://site0.example/p"),
            pmod(xxhash64(col("src")), lit(7))))
          .as("dst"))
    val snapB = snapA.where(rotKey >= churn)
      .union(fresh)
      .where(!deadHost(col("src")) && !deadHost(col("dst")))
      .dropDuplicates("src", "dst")
      .localCheckpoint(true)

    // ---- contract once per snapshot (shared by diff + the rank runs) ----
    val ha = HostGraph.contract(snapA).localCheckpoint(true)
    val hb = HostGraph.contract(snapB).localCheckpoint(true)

    // churn profile at host level — the real g27 operator core over the
    // contracted tables the rank runs reuse
    val profile = CrawlDiff.diffContracted(ha, hb)
      .groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      .withDefaultValue(0L)

    val p = graft.algo.PageRank.Params(tol = tol, maxIter = 200,
      numPartitions = cores, weightCol = Some("weight"))

    def timedRank(he: org.apache.spark.sql.DataFrame,
                  prev: Option[org.apache.spark.sql.DataFrame])
    : (org.apache.spark.sql.DataFrame, Int, Double) = {
      val t0 = System.nanoTime()
      val (ranks, steps) = HostGraph.rankContracted(he, prev, p)
      val mat = ranks.localCheckpoint(true) // include the final join+write
      // NO releaseLeaves here: ranks' plan leaves include the SHARED ha/hb
      // contraction checkpoints the sibling runs still read; the retained
      // final states are host-cardinality tiny and die with the session
      ((mat, steps, (System.nanoTime() - t0) / 1e9))
    }

    val (ranksA, stepsA, secA) = timedRank(ha, None)
    val (coldB, stepsCold, secCold) = timedRank(hb, None)
    val (warmB, stepsWarm, secWarm) = timedRank(hb, Some(ranksA))

    // sanity: both B runs sit at the same fixpoint (tol/(1-d) bound)
    val maxDiff = coldB.withColumnRenamed("rank", "rc")
      .join(warmB.withColumnRenamed("rank", "rw"), Seq("host"))
      .agg(max(abs(col("rc") - col("rw")))).collect()(0).getDouble(0)

    val counts = Seq(snapA, snapB, ha, hb).map(_.count())
    val hostsB = hb.select(col("src_host")).union(hb.select(col("dst_host")))
      .distinct().count()
    println(
      s"""{"sites":$sites,"pps":$pps,"churn_pct":$churn,"tol":$tol,""" +
      s""""cores":$cores,"url_edges_a":${counts(0)},""" +
      s""""url_edges_b":${counts(1)},"host_edges_a":${counts(2)},""" +
      s""""host_edges_b":${counts(3)},"hosts_b":$hostsB,""" +
      s""""host_pairs_persisted":${profile("persisted")},""" +
      s""""host_pairs_removed":${profile("removed")},""" +
      s""""host_pairs_added":${profile("added")},""" +
      f""""cold_a":{"steps":$stepsA,"sec":$secA%.1f},""" +
      f""""cold_b":{"steps":$stepsCold,"sec":$secCold%.1f},""" +
      f""""warm_b":{"steps":$stepsWarm,"sec":$secWarm%.1f},""" +
      f""""max_rank_diff":$maxDiff%.2e}""")
    spark.stop()
  }
}
