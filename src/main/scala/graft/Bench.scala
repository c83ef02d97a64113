package graft

import org.apache.spark.sql.SparkSession

import graft.algo.{ConnectedComponents, LabelPropagation, PageRank, TriangleCount}
import graft.graphbuild.EdgeBuilder
import graft.sources.PagesGen

/** Round benchmark (driver contract): one JSON line on stdout.
  *
  * Two sections:
  *  - headline link-graph pipeline (north rule): synthesize pages →
  *    extract/normalize/dedup edges → PageRank to 1e-6 → CC → triangles →
  *    LP; reports edges/sec for the PageRank superstep loop;
  *  - the full operator registry at $SPARK_GRAFT_SF_DIR with per-query secs.
  *
  * Scaling evidence across parallelism levels lives in
  * [[graft.bench.Scaling]] (N vs 4N cores, same input — BASELINE.md §protocol).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // big enough that PageRank supersteps are shuffle-dominated, not
    // fixed-overhead-dominated (~1M edges; cf. BASELINE.md saturation notes)
    val sites = sys.env.getOrElse("SPARK_GRAFT_BENCH_SITES", "2000").toInt
    val pagesPerSite = sys.env.getOrElse("SPARK_GRAFT_BENCH_PPS", "100").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- headline: the north-rule pipeline -------------------------------
    val pages = PagesGen.generate(spark, sites, pagesPerSite, seed = 42L,
      partitions = cpus)
    // unique per run: concurrent benches must not clobber each other
    val edgeDir = s"/tmp/graft_bench_edges_${ProcessHandle.current().pid()}"
    val (_, buildSec) = timed {
      EdgeBuilder.idEdges(EdgeBuilder.edges(EdgeBuilder.links(pages)))
        .write.mode("overwrite").parquet(edgeDir)
    }
    val edges = spark.read.parquet(edgeDir)
    val nEdges = edges.count()

    val (pr, prSec) = timed {
      PageRank.run(edges, PageRank.Params(tol = 1e-6, maxIter = 100,
        numPartitions = cpus))
    }
    val prSteps = pr.steps
    val edgesPerSec = nEdges.toDouble * prSteps / prSec

    val (cc, ccSec) = timed {
      ConnectedComponents.run(edges, numPartitions = cpus)
    }
    val (tri, triSec) = timed {
      TriangleCount.total(edges, numPartitions = cpus)
    }
    val (_, lpSec) = timed {
      LabelPropagation.run(edges, numPartitions = cpus, maxIter = 5).state.count()
    }

    // ---- operator registry at sfDir --------------------------------------
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":${v}%.3f""" }
      .mkString("{", ",", "}")
    val total = buildSec + prSec + ccSec + triSec + lpSec + results.map(_._2).sum

    val graphJson =
      f"""{"pages":${sites.toLong * pagesPerSite},"edges":$nEdges,""" +
        f""""build_sec":$buildSec%.2f,"pagerank_sec":$prSec%.2f,""" +
        f""""pagerank_steps":$prSteps,"pagerank_edges_per_sec":$edgesPerSec%.0f,""" +
        f""""cc_sec":$ccSec%.2f,"cc_steps":${cc.steps},""" +
        f""""triangles":$tri,"triangles_sec":$triSec%.2f,"lp_sec":$lpSec%.2f}"""

    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""graph":$graphJson,"cores":$cpus,"sf":"$sfDir"}"""
    // sidecar file for local iteration; stdout line is the driver contract
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LOCAL.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop() // stop FIRST so no Spark shutdown logs trail the JSON line
    println(line)
    System.out.flush()
  }
}
