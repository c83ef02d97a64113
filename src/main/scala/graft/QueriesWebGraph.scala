package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import QueryUtil._
import graft.webgraph._

/** Graph-construction parity queries (SURVEY.md §2.3 J1-J6, §2.4 A1/A2,
  * §2.7 F7-F9/F13-F15/F19): the reference's OpenWPM→property-graph
  * assembly over the deterministic engine-side crawl fixture
  * (FIXTURES.md §3). The fixture can't be seen by DuckDB → rows-only here;
  * exact semantics are pinned by WebGraphSpec goldens. */
object QueriesWebGraph {

  val reg: Seq[Entry] = Seq(

    // The unified 23-column-model node table after A1 consolidation,
    // setter attach (A2/J5, latest-setter parity quirk) and party flags.
    ("wg1_unified_nodes", (s: SparkSession, dir: String) => {
      val (nodes, _) = GraphAssembly.unifiedGraph(
        FixtureCrawl.requests(s), FixtureCrawl.responses(s),
        FixtureCrawl.redirects(s), FixtureCrawl.callstacks(s),
        FixtureCrawl.jsCalls(s))
      nodes.orderBy("name")
    }, None),

    // The unified edge table: redirect chains (J1), call-stack hops (J2),
    // anti-joined normal edges (J3/P7), element create/setsrc (J4),
    // storage/cookie explodes (F7/F8), HTTP cookie headers (F9/J6).
    ("wg2_unified_edges", (s: SparkSession, dir: String) => {
      val (_, edges) = GraphAssembly.unifiedGraph(
        FixtureCrawl.requests(s), FixtureCrawl.responses(s),
        FixtureCrawl.redirects(s), FixtureCrawl.callstacks(s),
        FixtureCrawl.jsCalls(s))
      edges.groupBy(col("action")).agg(count(lit(1)).as("n_edges"))
        .orderBy("action")
    }, None)
  )
}
