package graft.webgraph

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-site graph assembly: cookie setters (A2/J5), node consolidation
  * (A1), party flags (F15), and the unified nodes+edges table the reference
  * writes as graph.csv (SURVEY.md §1.1, §3 E1 steps run.py:146-165).
  * eTLD+1 plans as the native codegen'd `etld1` expression (graft.ext).
  */
object GraphAssembly {

  private def etld1(c: org.apache.spark.sql.Column) =
    call_function("etld1", c)

  /** A2 + quirk §2.11.1: per (visit_id, cookie) "original setter" — the
    * reference sorts time_stamp DESCENDING and takes the first row, so the
    * LATEST set event wins despite the name
    * (/root/reference/code/graph/utils.py:46-75). `parityLatest=false`
    * flips to the presumably-intended earliest-setter semantics. */
  def originalSetters(storageEdges: DataFrame,
                      parityLatest: Boolean = true): DataFrame = {
    val sets = storageEdges.where(col("action") === "set" ||
      col("action") === "set_js")
    val ord = if (parityLatest) col("time_stamp").desc else col("time_stamp").asc
    val w = Window.partitionBy(col("visit_id"), col("dst"))
      .orderBy(ord, col("src").asc)
    sets.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("visit_id"), col("dst").as("name"),
        col("src").as("setter"), col("time_stamp").as("setting_time_stamp"))
  }

  /** J5: attach setters to storage nodes (full outer — setters of cookies
    * without node rows survive, as in the reference's outer merge). */
  def setterNodes(storageNodes: DataFrame, setters: DataFrame): DataFrame =
    storageNodes.join(setters, Seq("visit_id", "name"), "full_outer")

  /** A1: node consolidation — one row per (visit_id, name); type resolved
    * by priority Script > Document > Element > Request when multiple
    * distinct types collide (single distinct type passes through, so
    * Storage survives); attr resolved to the single distinct value, else
    * the first containing "top_level_url", else "".
    * (graph_builder.py:26-65 re-expressed as one aggregation — no
    * collect_list + Python UDF pass.) */
  def consolidateNodes(nodes: DataFrame): DataFrame = {
    val typePri = when(col("type") === "Script", 4)
      .when(col("type") === "Document", 3)
      .when(col("type") === "Element", 2)
      .when(col("type") === "Request", 1)
      .otherwise(0)
    nodes
      .groupBy(col("visit_id"), col("name"))
      .agg(
        countDistinct(col("type")).as("n_types"),
        first(col("type"), ignoreNulls = true).as("any_type"),
        max(struct(typePri.as("p"), col("type").as("t"))).as("pri_type"),
        countDistinct(col("attr")).as("n_attrs"),
        first(col("attr"), ignoreNulls = true).as("any_attr"),
        max(when(col("attr").contains("top_level_url"), col("attr")))
          .as("tlu_attr"),
        first(col("top_level_url"), ignoreNulls = true).as("top_level_url"),
        first(col("domain"), ignoreNulls = true).as("domain"),
        first(col("setter"), ignoreNulls = true).as("setter"),
        first(col("setting_time_stamp"), ignoreNulls = true)
          .as("setting_time_stamp"))
      .select(
        col("visit_id"), col("name"), col("top_level_url"),
        when(col("n_types") <= 1, col("any_type"))
          .when(col("pri_type.p") > 0, col("pri_type.t"))
          .otherwise("Request").as("type"),
        when(col("n_attrs") <= 1, col("any_attr"))
          .otherwise(coalesce(col("tlu_attr"), lit(""))).as("attr"),
        col("domain"), col("setter"), col("setting_time_stamp"))
  }

  /** The full unified graph table for one crawl (all visits at once — the
    * reference's per-visit loop is just a grouping column here, SURVEY.md
    * §3): nodes+edges with graph_attr discriminator, eTLD+1 domains,
    * top_level_domain, party flags (F15, storage nodes only). */
  def unifiedGraph(requests: Dataset[HttpRequest],
                   responses: Dataset[HttpResponse],
                   redirects: Dataset[HttpRedirect],
                   callstacks: Dataset[CallStack],
                   js: Dataset[JsCall]): (DataFrame, DataFrame) = {
    graft.ext.GraftExtensions.register(requests.sparkSession)
    val (httpNodes, httpEdges) = RequestGraph.build(requests, responses,
      redirects, callstacks)
    val (htmlNodes, htmlEdges) = HtmlGraph.build(js)
    val (storNodes, storEdges) = StorageGraph.build(js)
    val (hcNodes, hcEdges) = HttpCookieGraph.build(httpEdges, httpNodes)

    // setters over all storage-writing edges (JS + HTTP set actions)
    val setters = originalSetters(
      storEdges.select("visit_id", "src", "dst", "action", "time_stamp")
        .unionByName(hcEdges.select("visit_id", "src", "dst", "action",
          "time_stamp")))

    val baseCols = Seq("visit_id", "name", "top_level_url", "type", "attr")
    def pad(df: DataFrame, cols: Seq[String]): DataFrame =
      cols.foldLeft(df)((d, c) =>
        if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast("string")))

    val allNodes0 = Seq(
      pad(httpNodes, baseCols :+ "domain"),
      pad(htmlNodes, baseCols :+ "domain"),
      pad(storNodes, baseCols :+ "domain"),
      pad(hcNodes, baseCols :+ "domain"))
      .map(_.select((baseCols :+ "domain").map(col): _*))
      .reduce(_ unionByName _)
      .withColumn("domain",
        coalesce(col("domain"), etld1(col("name"))))

    val withSetters = setterNodes(allNodes0, setters)
    val consolidated = consolidateNodes(withSetters
      .select(col("visit_id"), col("name"), col("top_level_url"),
        col("type"), col("attr"), col("domain"), col("setter"),
        col("setting_time_stamp")))
      .withColumn("top_level_domain", etld1(col("top_level_url")))
      .withColumn("party",
        when(col("type") === "Storage" && col("domain").isNotNull &&
          col("top_level_domain").isNotNull,
          when(col("domain") === col("top_level_domain"), "first")
            .otherwise("third"))
          .otherwise("N/A"))
      // no dedup needed: consolidateNodes' groupBy(visit_id, name) already
      // yields one row per key and every appended column is a
      // deterministic function of that row — a dropDuplicates here was a
      // no-op costing a full-width exchange per run
      .withColumn("graph_attr", lit("Node"))

    // `attr` carries storage values on storage/cookie edges (J9 reads
    // them back, IndirectEdges) — part of the reference's 23-col schema.
    val edgeCols = Seq("visit_id", "src", "dst", "top_level_url", "attr",
      "reqattr", "respattr", "response_status", "time_stamp", "content_hash",
      "post_body", "post_body_raw", "action")
    val allEdges = Seq(httpEdges, htmlEdges, storEdges, hcEdges)
      .map(df => pad(df, edgeCols).select(edgeCols.map(col): _*))
      .reduce(_ unionByName _)
      .withColumn("top_level_domain", etld1(col("top_level_url")))
      .withColumn("graph_attr", lit("Edge"))
      .dropDuplicates()

    (consolidated, allEdges)
  }
}
