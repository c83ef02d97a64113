package graft.graphbuild

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.GraftExtensions

/** Host-level contraction of a url-level link graph — the Common-Crawl
  * "domain/host web graph" workflow: collapse page-to-page edges into
  * registrable-domain edges carrying link multiplicities, ready for the
  * weighted north-rule algorithms (weighted PageRank over the contracted
  * graph is the classic domain-ranking job; Common Crawl publishes exactly
  * this artifact as its host- and domain-level web graphs).
  *
  * Scale shape: one url-level dedup (the north_star's "deduplicated
  * url-normalized edge Dataset" — an aggregate, map-side combined), one
  * host mapping via the native codegen'd `etld1` expression (no UDF), one
  * (src_host, dst_host) count aggregate. Hosts are LOW-cardinality
  * relative to pages (10⁷-ish domains vs 10¹² pages), so the contracted
  * table is small enough for downstream joins to broadcast — but the
  * contraction itself never assumes that: both aggregates are algebraic
  * partial aggs over the full edge volume.
  */
object HostGraph {

  /** Default host rule: registrable domain (eTLD+1) of the url, via the
    * native expression (PSL + unknown-TLD fallback, null for IPs /
    * single-label hosts). */
  def defaultHost(url: Column): Column = call_function("etld1", url)

  /** Contract a url-edge table (src, dst urls) to
    * (src_host, dst_host, weight):
    *  - url-level edges dedup'd FIRST (multiplicity = distinct page links,
    *    not crawl-event count — the Common-Crawl convention);
    *  - hosts via `hostExpr` (default eTLD+1); null hosts dropped
    *    (unparseable urls — reference's try/except→None);
    *  - intra-host edges dropped (host-graph convention: self-loops carry
    *    no ranking signal and dwarf cross-host weight on big sites);
    *  - weight = count of surviving url-level links per host pair. */
  def contract(urlEdges: DataFrame,
               hostExpr: Column => Column = defaultHost): DataFrame = {
    GraftExtensions.register(urlEdges.sparkSession)
    urlEdges.select(col("src"), col("dst"))
      .dropDuplicates("src", "dst")
      .select(hostExpr(col("src")).as("src_host"),
        hostExpr(col("dst")).as("dst_host"))
      .where(col("src_host").isNotNull && col("dst_host").isNotNull &&
        col("src_host") =!= col("dst_host"))
      .groupBy("src_host", "dst_host").agg(count(lit(1)).as("weight"))
  }

  /** Attach stable numeric vertex ids for the superstep algorithms
    * (PageRank et al. take long ids): returns
    * (edges(src, dst, weight), hosts(id, host)). Ids are xxhash64 of the
    * host string — deterministic, content-derived (F19), no driver-side
    * dictionary. Collision odds at 10⁷-domain scale ≈ 3·10⁻⁶ (birthday,
    * 64-bit); a collision would merge two hosts' vertices — detectable by
    * `hosts` count vs distinct id count, and acceptable for ranking use. */
  def withIds(hostEdges: DataFrame): (DataFrame, DataFrame) = {
    val hosts = hostEdges.select(col("src_host").as("host"))
      .union(hostEdges.select(col("dst_host")))
      .distinct()
      .select(xxhash64(col("host")).as("id"), col("host"))
    val edges = hostEdges.select(
      xxhash64(col("src_host")).as("src"),
      xxhash64(col("dst_host")).as("dst"),
      col("weight"))
    (edges, hosts)
  }

  /** Weighted PageRank over an already-contracted host-edge table
    * (src_host, dst_host, weight) — optionally INCREMENTAL: pass the
    * previous crawl's converged (host, rank) table and the superstep loop
    * warm-starts from it (hosts new to this snapshot get 1/N, mass
    * renormalizes to 1 — PageRank.run's warmStart contract). At
    * Common-Crawl cadence the month-over-month domain graph churns a few
    * percent, so the warm state already sits near the new fixpoint and
    * convergence takes a fraction of the cold supersteps: re-ranking cost
    * tracks the CHURN, not the corpus. Host→id mapping is the same
    * content-derived xxhash64 as [[withIds]], so the previous ranks join by
    * recomputing it — no id table needs to survive between crawls.
    * @return (ranks(host, rank), supersteps taken) */
  def rankContracted(hostEdges: DataFrame,
                     prevRanks: Option[DataFrame] = None,
                     p: graft.algo.PageRank.Params =
                       graft.algo.PageRank.Params(weightCol = Some("weight")),
                     cfg: Option[graft.algo.Superstep.Config] = None)
  : (DataFrame, Int) = {
    val (e, hosts) = withIds(hostEdges)
    val warm = prevRanks.map(pr =>
      pr.select(xxhash64(col("host")).as("id"), col("rank")))
    val res = graft.algo.PageRank.run(e, p, cfg, warmStart = warm)
    (res.state.join(hosts, Seq("id")).select(col("host"), col("rank")),
      res.steps)
  }

  /** [[contract]] + [[rankContracted]] in one call: url edges in, ranked
    * hosts out (the full Common-Crawl domain-ranking job, incrementally
    * warm-startable across snapshots). */
  def rankHosts(urlEdges: DataFrame,
                prevRanks: Option[DataFrame] = None,
                p: graft.algo.PageRank.Params =
                  graft.algo.PageRank.Params(weightCol = Some("weight")),
                cfg: Option[graft.algo.Superstep.Config] = None,
                hostExpr: Column => Column = defaultHost): (DataFrame, Int) =
    rankContracted(contract(urlEdges, hostExpr), prevRanks, p, cfg)

  /** Export the contracted host graph through the graph.csv interchange
    * sink (S5 — the same 23-column unified schema the reference re-ingests,
    * graph_builder.py conventions): one Node row per host (`name`), one
    * Edge row per weighted host link (`src`/`dst` = registrable domains,
    * `attr` = weight, type discriminates). The Common-Crawl domain-graph
    * artifact thereby round-trips OUT of the engine into the reference's
    * own interchange format; [[importGraphCsv]] reads the identical
    * (src_host, dst_host, weight) table back (HostGraphSpec pins
    * contract-output equality on the round trip — VERDICT r4 #6). */
  def exportGraphCsv(hostEdges: DataFrame, path: String): Unit = {
    val nodes = hostEdges.select(col("src_host").as("name"))
      .union(hostEdges.select(col("dst_host")))
      .distinct()
      .withColumn("graph_attr", lit("Node"))
      .withColumn("type", lit("Host"))
    val edges = hostEdges.select(
      col("src_host").as("src"), col("dst_host").as("dst"),
      col("weight").cast("string").as("attr"))
      .withColumn("graph_attr", lit("Edge"))
      .withColumn("type", lit("HostLink"))
    graft.sources.GraphCsv.write(
      graft.sources.GraphCsv.unified(nodes, edges), path)
  }

  /** Inverse of [[exportGraphCsv]]: re-ingest a host-graph graph.csv back
    * to the contracted (src_host, dst_host, weight) table. */
  def importGraphCsv(spark: org.apache.spark.sql.SparkSession,
                     path: String): DataFrame = {
    val (_, edges) = graft.sources.GraphCsv.split(
      graft.sources.GraphCsv.read(spark, path),
      nodeCols = Seq("name"), edgeCols = Seq("src", "dst", "attr"))
    edges.select(col("src").as("src_host"), col("dst").as("dst_host"),
      col("attr").cast("long").as("weight"))
  }
}
