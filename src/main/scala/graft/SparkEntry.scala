package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.algo.{ConnectedComponents, PageRank, TriangleCount}
import graft.graphbuild.EdgeBuilder
import graft.sources.PagesGen

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the full north-rule pipeline at smoke scale — synthesize a
    * deterministic Common-Crawl-shaped pages table, extract + url-normalize
    * links, build the deduplicated hashed-id edge Dataset, run PageRank to
    * 1e-6, and return the top pages joined back to their urls/domains. */
  def entry(spark: SparkSession): DataFrame = {
    val pages = PagesGen.generate(spark, sites = 20, pagesPerSite = 25,
      seed = 42L, partitions = 8)
    val (links, edges, vertices) = EdgeBuilder.build(pages)
    val ranks = PageRank.run(EdgeBuilder.idEdges(edges),
      PageRank.Params(tol = 1e-6, maxIter = 100, numPartitions = 8)).state
    ranks.join(vertices, ranks("id") === vertices("id"))
      .select(vertices("url"), vertices("domain"), ranks("rank"))
      .orderBy(desc("rank"), asc("url"))
      .limit(50)
  }

  /** One entry per implemented operator from SURVEY.md §2.
    * Populated operator-by-operator; each SQL-expressible entry has a
    * DuckDB oracle in [[oracleSql]]. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}
