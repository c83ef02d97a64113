package graft.graphbuild

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.TextExtract
import graft.model.{Edge, Link, Page, Vertex}
import graft.norm.UrlNorm

/** pages → links → deduplicated, id-hashed edge Dataset + vertex dictionary.
  *
  * The reference materializes a networkx DiGraph from an edge list
  * (/root/reference/code/graph/graph_builder.py:66-68); parallel edges
  * collapse there while table-level counts still see the multiset
  * (SURVEY.md §2.11.5). We therefore expose BOTH:
  *   - `links`    : the multiset of link occurrences (for count features),
  *   - `edges`    : `dropDuplicates(src_id, dst_id)` simple digraph
  *                  (for topology algorithms).
  *
  * Vertex ids are `xxhash64(normalized url)` — a codegen'd Catalyst
  * expression, content-derived (stable across runs/cluster sizes, unlike
  * `monotonically_increasing_id`, SURVEY.md §2.7 F19). The string url is
  * carried only in the dictionary; all shuffles key on the 8-byte id
  * (string shuffle keys at 10^12 scale are prohibitive, SURVEY.md §1.3).
  */
object EdgeBuilder {

  /** Extract + resolve + normalize outlinks. Self-loops dropped (a link to
    * the page itself carries no topology information and breaks triangle
    * semantics). Runs as a typed flatMap — one pass over html, no UDF-in-SQL
    * boundary crossings per href. */
  def links(pages: Dataset[Page]): Dataset[Link] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.flatMap { p =>
      UrlNorm.normalize(p.url) match {
        case None => Iterator.empty
        case Some(base) =>
          TextExtract.hrefs(p.html).iterator
            .flatMap(h => UrlNorm.resolve(base, h))
            .filter(_ != base)
            .map(dst => Link(base, dst, p.warc_ts))
      }
    }
  }

  /** Deduplicated simple digraph with hashed ids. */
  def edges(links: Dataset[Link]): Dataset[Edge] = {
    val spark = links.sparkSession
    import spark.implicits._
    links
      .select(
        xxhash64($"src").as("src_id"),
        xxhash64($"dst").as("dst_id"),
        $"src", $"dst")
      .dropDuplicates("src_id", "dst_id")
      .as[Edge]
  }

  /** Vertex dictionary: every url appearing as src or dst, with eTLD+1. */
  def vertices(links: Dataset[Link]): Dataset[Vertex] = {
    val spark = links.sparkSession
    import spark.implicits._
    graft.ext.GraftExtensions.register(spark)
    links.select($"src".as("url"))
      .union(links.select($"dst".as("url")))
      .distinct()
      .select(xxhash64($"url").as("id"), $"url",
        call_function("etld1", $"url").as("domain"))
      .as[Vertex]
  }

  /** In/out degree per vertex on the simple digraph (SURVEY.md §2.8 G1):
    * one shuffle each, full outer to keep zero-degree sides. */
  def degrees(edges: Dataset[Edge]): DataFrame = {
    val out = edges.groupBy(col("src_id").as("id"))
      .agg(count("*").as("out_degree"))
    val in = edges.groupBy(col("dst_id").as("id"))
      .agg(count("*").as("in_degree"))
    out.join(in, Seq("id"), "full_outer")
      .na.fill(0L, Seq("out_degree", "in_degree"))
  }

  /** Full pipeline convenience: pages → (links, edges, vertices). */
  def build(pages: Dataset[Page]): (Dataset[Link], Dataset[Edge], Dataset[Vertex]) = {
    val l = links(pages)
    (l, edges(l), vertices(l))
  }

  /** Edge table as a plain (src, dst) long-pair DataFrame for the algos. */
  def idEdges(edges: Dataset[Edge]): DataFrame =
    edges.select(col("src_id").as("src"), col("dst_id").as("dst"))

  def fromPages(spark: SparkSession, sites: Int, pagesPerSite: Int,
                seed: Long = 42L, partitions: Int = 32): DataFrame = {
    val pages = graft.sources.PagesGen.generate(spark, sites, pagesPerSite, seed, partitions)
    idEdges(edges(links(pages)))
  }
}
