package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.algo._
import graft.checkpoint.ParquetStore
import graft.graphbuild.EdgeBuilder
import graft.model.Page

/** The production entry point (north rule: "launched via spark-submit on
  * multi-executor clusters"):
  *
  *   spark-submit --class graft.tools.Pipeline <jar> \
  *     --pages <parquet dir>  (url, warc_ts, html, text, lang)  \
  *     --out <dir>  [--partitions N] [--tol 1e-6] [--checkpoint <dir>] \
  *     [--run-id <id>] [--store parquet|snapshot] [--expire-keep K] \
  *     [--async-ckpt] [--bucket-edges] [--host-graph] [--host-csv]
  *     [--prev-host-ranks <parquet>]  (warm-start host ranking from a
  *                                     previous crawl's host_ranks table)
  *     [--prev-host-edges <parquet>]  (also write host_churn/ — the
  *                                     domain-graph diff vs the previous
  *                                     crawl's host_edges table)
  *
  * Stages (each written as parquet under --out; resumable through
  * --checkpoint + --run-id mid-PageRank):
  *   edges/      deduplicated url-normalized hashed-id edge table
  *   vertices/   id → url, eTLD+1 dictionary
  *   degrees/    in/out degrees
  *   pagerank/   (id, rank) to --tol convergence, dangling-aware
  *   components/ (id, comp) exact
  *   labels/     (id, label) label propagation
  *   triangles/  (id, triangles) exact per-vertex counts
  *   metrics.json  superstep metrics (steps, measures, seconds)
  *   with --host-graph: host_edges/ host_ranks/ host_langs/ (per-host
  *   language mix off the input_hint `lang` column) and, with
  *   --prev-host-edges, host_churn/
  *
  * When --pages is omitted a deterministic synthetic corpus is generated
  * (--sites/--pps), satisfying the no-external-data rule for local runs.
  */
object Pipeline {

  private def arg(args: Array[String], name: String): Option[String] = {
    val i = args.indexOf(s"--$name")
    if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
  }

  /** Order-independent content signature of a frame: bit_xor of per-row
    * xxhash64 (overflow-free under ANSI, unlike a 64-bit SUM); empty frame
    * → 0 (coalesce — a bare getLong on a null aggregate throws). Folded
    * into every checkpoint lineage id so a reused --checkpoint/--run-id
    * can NEVER resume a superstep loop from a previous crawl's converged
    * snapshot (old vertex set, stale degrees — silently wrong ranks):
    * same input content ⇒ same id ⇒ crash-resume within a run still
    * works; a new crawl's input opens a fresh lineage unconditionally.
    * Costs one column-pruned scan of the input per run — noise next to
    * the superstep loop it protects. */
  private def contentSig(df: org.apache.spark.sql.DataFrame,
                         cols: Seq[String]): String = {
    val h = df.select(xxhash64(cols.map(col): _*).as("h"))
      .agg(coalesce(expr("bit_xor(h)"), lit(0L)))
      .collect()(0).getLong(0)
    f"$h%016x"
  }

  def main(args: Array[String]): Unit = {
    // machine-read JSON below is built with the f-interpolator, which
    // formats via the JVM default locale (comma decimals under de_DE etc.)
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val out = arg(args, "out").getOrElse(
      sys.error("--out <dir> is required"))
    val partitions = arg(args, "partitions").map(_.toInt).getOrElse(32)
    val tol = arg(args, "tol").map(_.toDouble).getOrElse(1e-6)

    val builder = SparkSession.builder()
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", partitions)
      .config("spark.sql.session.timeZone", "UTC")
      // subset co-partitioning: a child hash-partitioned on a SUBSET of
      // the join keys co-partitions the join (the wg4 redirect assembly
      // pre-partitions its four inputs on (visit_id, old_request_id) and
      // every URL-suffixed join + window reuses that one exchange —
      // PLANS.md wg4 row); engine repartitions are all deliberate
      // high-cardinality keys, so the skew guard the default protects
      // against does not apply
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
    // spark-submit injects spark.master; standalone runs default to local
    val spark = (if (sys.props.contains("spark.master")) builder
      else builder.master(arg(args, "master").getOrElse("local[*]")))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val pages = arg(args, "pages") match {
      case Some(dir) => spark.read.parquet(dir).as[Page]
      case None => graft.sources.PagesGen.generate(spark,
        sites = arg(args, "sites").map(_.toInt).getOrElse(200),
        pagesPerSite = arg(args, "pps").map(_.toInt).getOrElse(50),
        seed = 42L, partitions = partitions)
    }

    // per-stage memory/spill accounting (soak protocol — BASELINE.md)
    val mem = new graft.bench.StageMemoryTracker
    spark.sparkContext.addSparkListener(mem)

    mem.phase("extract_build")
    val (_, edgesDs, vertices) = EdgeBuilder.build(pages)
    edgesDs.write.mode(SaveMode.Overwrite).parquet(s"$out/edges")
    vertices.write.mode(SaveMode.Overwrite).parquet(s"$out/vertices")

    mem.phase("degrees")
    // --bucket-edges: ALSO land the id-edge table hash-bucketed by src
    // (Iceberg bucket(P, src) layout; graft.sources.BucketedEdges) and feed
    // the algorithms from the catalog read — the per-run
    // repartition(P, src) shuffle of the full edge table disappears
    // (PageRank.Params.prePartitioned). Costs one extra bucketed write now;
    // every later run over the same table (warm starts, re-convergence,
    // degree scans) starts shuffle-free.
    val bucketEdges = args.contains("--bucket-edges")
    val edges =
      if (bucketEdges) {
        graft.sources.BucketedEdges.write(
          spark.read.parquet(s"$out/edges")
            .select(col("src_id").as("src"), col("dst_id").as("dst")),
          table = "graft_edges_bucketed", buckets = partitions,
          path = Some(s"$out/edges_bucketed"))
        graft.sources.BucketedEdges.read(spark, "graft_edges_bucketed")
      } else spark.read.parquet(s"$out/edges")
        .select(col("src_id").as("src"), col("dst_id").as("dst"))
    EdgeBuilder.degrees(spark.read.parquet(s"$out/edges")
        .as[graft.model.Edge])
      .write.mode(SaveMode.Overwrite).parquet(s"$out/degrees")

    // --store snapshot selects the Iceberg-shaped store (snapshot log +
    // manifests + version-hint commit); default stays the plain parquet one.
    // The run-id carries the edge-table content signature (contentSig
    // scaladoc): a monthly re-crawl reusing --checkpoint/--run-id gets a
    // fresh lineage instead of resuming from last crawl's converged state.
    val store = arg(args, "checkpoint").map { dir =>
      val inSig = contentSig(spark.read.parquet(s"$out/edges")
        .select(col("src_id"), col("dst_id")), Seq("src_id", "dst_id"))
      val runId = arg(args, "run-id").getOrElse("pipeline") + s"-in$inSig"
      arg(args, "store").getOrElse("parquet") match {
        case "snapshot" => new graft.checkpoint.SnapshotStore(dir, runId)
        case _          => new ParquetStore(dir, runId)
      }
    }
    // --async-ckpt moves snapshot writes off the superstep critical path
    // (Superstep.Config.asyncCheckpoint scaladoc for the semantics)
    val prCfg = store.map(s => Superstep.Config(partitions, 200, tol,
      checkpointEvery = 5, store = Some(s), verbose = true,
      asyncCheckpoint = args.contains("--async-ckpt")))

    mem.phase("pagerank")
    val pr = PageRank.run(edges,
      PageRank.Params(tol = tol, maxIter = 200, numPartitions = partitions,
        prePartitioned = bucketEdges),
      prCfg)
    pr.state.write.mode(SaveMode.Overwrite).parquet(s"$out/pagerank")
    // bound checkpoint disk on long runs: keep only the newest K snapshots
    // once the converged state is durably written above (snapshot store
    // only — expiry is an Iceberg-shaped table op)
    (store, arg(args, "expire-keep").map(_.toInt)) match {
      case (Some(s: graft.checkpoint.SnapshotStore), Some(k)) =>
        val dropped = s.expireSnapshots(k)
        if (dropped.nonEmpty)
          println(s"expired checkpoint snapshots: ${dropped.mkString(",")}")
      case _ => ()
    }

    mem.phase("components")
    val cc = ConnectedComponents.run(edges, partitions)
    cc.state.write.mode(SaveMode.Overwrite).parquet(s"$out/components")

    mem.phase("labels")
    val lp = LabelPropagation.run(edges, partitions)
    lp.state.write.mode(SaveMode.Overwrite).parquet(s"$out/labels")

    mem.phase("triangles")
    val (tri, triTotal) = TriangleCount.perVertexAndTotal(edges, partitions)
    tri.write.mode(SaveMode.Overwrite).parquet(s"$out/triangles")

    // --host-graph: the Common-Crawl domain-graph artifact — contract the
    // url-level edge table to registrable-domain weighted edges and rank
    // hosts with weighted PageRank (HostGraph scaladoc for the semantics).
    if (args.contains("--host-graph")) {
      mem.phase("hostgraph")
      val urlEdges = spark.read.parquet(s"$out/edges")
        .select(col("src"), col("dst"))
      // --prev-host-edges PATH: read EAGERLY before the contraction
      // overwrite below — the re-crawl caller typically points it at this
      // very out dir's last-month host_edges
      val prevEdges = arg(args, "prev-host-edges").map(pth =>
        spark.read.parquet(pth).localCheckpoint(true))
      // this run's contraction, materialized ONCE — feeds the churn diff,
      // the durable host_edges write, and the rank run below
      val hostEdges = graft.graphbuild.HostGraph.contract(urlEdges)
        .localCheckpoint(true)
      // domain-graph churn vs the previous crawl (CrawlDiff.diffContracted
      // — the g27 operator) → host_churn/. The prev checkpoint releases
      // before the rank supersteps start instead of pinning executor
      // storage across them. The durable host_edges OVERWRITE happens at
      // the very END of this stage (after host_ranks/host_langs): a crash
      // anywhere during the long rank supersteps — or before — leaves last
      // month's table intact on disk, so the documented re-run with
      // --prev-host-edges pointed at this same out dir reproduces the real
      // month-over-month churn instead of silently self-diffing (delta 0).
      prevEdges.foreach { pe =>
        graft.graphbuild.CrawlDiff.diffContracted(pe, hostEdges)
          .write.mode(SaveMode.Overwrite).parquet(s"$out/host_churn")
        graft.core.Checkpoints.release(pe)
      }
      // --prev-host-ranks PATH: warm-start from a previous crawl's
      // converged host_ranks table (incremental re-crawl ranking —
      // HostGraph.rankContracted scaladoc). The read is eager so a caller
      // pointing it at THIS run's output path can't race the overwrite.
      val prev = arg(args, "prev-host-ranks").map(pth =>
        spark.read.parquet(pth).localCheckpoint(true))
      // Lineage id for the host rank loop = base + INPUT signature
      // (hostEdges content, computed UNCONDITIONALLY — churn-only monthly
      // re-runs without --prev-host-ranks used to get a constant '-host'
      // id and silently resume from the previous crawl's converged
      // snapshot) + warm-start signature when warm-starting (two warm
      // sources over the same input must not share a lineage either).
      // Content-keyed, not path-keyed (paths are typically constant month
      // over month): a crashed invocation still resumes — the contraction
      // is deterministic, so same crawl ⇒ same ids — while any new-crawl
      // input opens a fresh lineage (contentSig scaladoc).
      val inSig = "-in" + contentSig(hostEdges,
        Seq("src_host", "dst_host", "weight"))
      val warmSig = prev.map(df =>
        "-warm" + contentSig(df, Seq("host", "rank"))).getOrElse("")
      // checkpointed like the main stage, under its own run-id so the two
      // stages' snapshot lineages never clobber each other
      val hostStore = arg(args, "checkpoint").map { dir =>
        val runId = arg(args, "run-id").getOrElse("pipeline") + "-host" +
          inSig + warmSig
        arg(args, "store").getOrElse("parquet") match {
          case "snapshot" => new graft.checkpoint.SnapshotStore(dir, runId)
          case _          => new ParquetStore(dir, runId)
        }
      }
      val hostCfg = hostStore.map(s => Superstep.Config(partitions, 200, tol,
        checkpointEvery = 5, store = Some(s), verbose = true,
        asyncCheckpoint = args.contains("--async-ckpt")))
      val (hostRanks, hprSteps) = graft.graphbuild.HostGraph.rankContracted(
        hostEdges, prev,
        PageRank.Params(tol = tol, maxIter = 200,
          numPartitions = partitions, weightCol = Some("weight")), hostCfg)
      hostRanks.write.mode(SaveMode.Overwrite).parquet(s"$out/host_ranks")
      prev.foreach(graft.core.Checkpoints.release)
      // per-host language mix off the input_hint `lang` column (the
      // Common-Crawl-style per-crawl language annotation rollup): distinct
      // urls per (host, lang) — the dedup-first convention host_edges
      // weights follow (a re-crawled url is one doc, not two). On the
      // --pages parquet path this is a url+lang-pruned scan; on the
      // synthetic path it deterministically regenerates pages (the
      // generator streams whole Page rows — pruning can't reach inside it).
      pages.toDF()
        .select(graft.graphbuild.HostGraph.defaultHost(col("url"))
          .as("host"), col("lang"), col("url"))
        .where(col("host").isNotNull)
        .groupBy("host", "lang").agg(countDistinct(col("url")).as("docs"))
        .write.mode(SaveMode.Overwrite).parquet(s"$out/host_langs")
      // --host-csv: also emit the domain-graph artifact in the reference's
      // graph.csv interchange shape (HostGraph.exportGraphCsv — Node rows
      // per host, Edge rows per weighted link; re-ingestable)
      if (args.contains("--host-csv"))
        graft.graphbuild.HostGraph.exportGraphCsv(hostEdges,
          s"$out/host_graph_csv")
      // LAST durable write of the stage (see the churn comment above): only
      // a fully-ranked crawl replaces last month's host_edges on disk
      hostEdges.write.mode(SaveMode.Overwrite).parquet(s"$out/host_edges")
      graft.core.Checkpoints.release(hostEdges)
      println(s"host graph -> $out/host_edges, host_ranks, host_langs" +
        prevEdges.map(_ => ", host_churn").getOrElse("") +
        s" (pr_steps=$hprSteps" +
        prev.map(_ => ", warm-started").getOrElse("") + ")")
    }
    mem.finish()
    // every plan over the bucketed read is materialized by now — undo the
    // session-wide autoBucketedScan pin read() had to take
    if (bucketEdges)
      graft.sources.BucketedEdges.restoreAutoBucketedScan(spark)

    val metrics = Seq(
      ("pagerank", pr.steps, pr.metrics.map(_.seconds).sum),
      ("components", cc.steps, cc.metrics.map(_.seconds).sum),
      ("labels", lp.steps, lp.metrics.map(_.seconds).sum))
      .map { case (n, st, sec) =>
        f"""{"stage":"$n","supersteps":$st,"seconds":$sec%.2f}""" }
      .mkString("[", ",", s"""],"triangles_total":$triTotal""")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/metrics.json"),
      s"""{"stages":$metrics,"memory":${mem.toJson}}""")
    println(s"pipeline memory: ${mem.toJson}")
    println(s"pipeline complete -> $out (triangles=$triTotal, pr_steps=${pr.steps})")
    spark.stop()
  }
}
