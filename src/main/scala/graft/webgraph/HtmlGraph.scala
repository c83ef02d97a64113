package graft.webgraph

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** HTML element graph construction (reference:
  * /root/reference/code/graph/html_edges.py — SURVEY.md §2.3 J4, §2.7 F19):
  * `window.document.createElement` calls become Element nodes + `create`
  * edges; `Element.src` setters become Request nodes + `setsrc` edges,
  * linked to their parent element through the shared openwpm tag.
  *
  * Conscious fixes vs the reference (SURVEY.md §2.11):
  *  - Element ids are content-derived (`Element_<xxhash64(natural
  *    key)>_<rn>`, rn = deterministic row_number within the natural-key
  *    group) instead of the pandas row index (html_edges.py:116) which is
  *    run-order-dependent — F19 determinism rule, one node per
  *    createElement row preserved;
  *  - `subtype` is pinned to "" — the reference's convert_subtype references
  *    an undefined variable and always falls through to "" (§2.11.2).
  */
object HtmlGraph {

  def build(js: Dataset[JsCall]): (DataFrame, DataFrame) = {
    graft.ext.GraftExtensions.register(js.sparkSession)
    // $['0'].openwpm as two chained native scans. The non-terminal step is
    // json_get_obj (container-only): the reference's dict navigation
    // (html_edges.py:22 `json.loads(attributes)["0"]["openwpm"]`, :66
    // `.get("0").get("openwpm")`) raises→empty when "0" holds a STRING —
    // plain chained json_get would unescape a double-encoded payload and
    // keep extracting, manufacturing a tag where the reference yields none.
    def openwpmTag(attributes: org.apache.spark.sql.Column) =
      call_function("json_get",
        call_function("json_get_obj", attributes, lit("0")), lit("openwpm"))
    // one NODE PER createElement ROW (the reference names by dataframe row
    // index, html_edges.py:116): the content hash alone would collapse
    // same-tick same-script same-arguments creations into one node, so a
    // deterministic row_number inside each natural-key group disambiguates
    // (ties ordered by attributes — the openwpm tag — then interchangeable)
    val keyW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("visit_id"), col("time_stamp"), col("script_url"),
        col("arguments"))
      .orderBy(col("attributes"))
    val created = js.toDF()
      .where(col("symbol") === "window.document.createElement")
      .withColumn("name",
        concat(lit("Element_"),
          xxhash64(col("visit_id"), col("time_stamp"), col("script_url"),
            col("arguments")),
          lit("_"), row_number().over(keyW)))
      .withColumn("openwpm_tag", openwpmTag(col("attributes")))
      .withColumn("attr", to_json(struct(
        col("openwpm_tag").as("openwpm"),
        lit("").as("subtype"),
        (col("script_loc_eval") =!= "").as("eval"))))

    val elementNodes = created.select(col("visit_id"), col("name"),
      col("top_level_url"), lit("Element").as("type"), col("attr"),
      col("openwpm_tag"))
    val createEdges = created.select(col("visit_id"),
      col("script_url").as("src"), col("name").as("dst"),
      col("top_level_url"), lit("create").as("action"), col("time_stamp"))

    val srcSets = js.toDF()
      .where(col("symbol").contains("Element.src") &&
        col("operation").contains("set"))
      .withColumn("openwpm_tag", openwpmTag(col("attributes")))

    // J4: parent element via the shared openwpm tag (left join — a src set
    // without a captured createElement keeps a null parent and is dropped
    // from edges by the name filter, as in the reference's dropna).
    val linked = srcSets.join(
      elementNodes.select(col("visit_id").as("ev"),
        col("openwpm_tag").as("etag"),
        col("name").as("parent_name")).dropDuplicates(),
      srcSets("openwpm_tag") === col("etag") &&
        srcSets("visit_id") === col("ev"), "left")
      .drop("ev", "etag")

    val srcNodes = linked
      .where(col("value").isNotNull)
      .select(col("visit_id"), col("value").as("name"), col("top_level_url"),
        lit("Request").as("type"), col("attributes").as("attr"))
    val srcEdges = linked
      .where(col("parent_name").isNotNull)
      .select(col("visit_id"), col("parent_name").as("src"),
        col("value").as("dst"), col("top_level_url"),
        lit("setsrc").as("action"), col("time_stamp"))

    // reference quirk kept (html_edges.py:131-150): the element/create
    // frames are only merged into the output INSIDE `if len(src_elements)
    // > 0` — a visit with createElement calls but zero Element.src sets
    // contributes NOTHING from this builder
    val visitsWithSrc = srcSets.select(col("visit_id")).distinct()
    val gatedElementNodes = elementNodes
      .join(visitsWithSrc, Seq("visit_id"), "left_semi")
    val gatedCreateEdges = createEdges
      .join(visitsWithSrc, Seq("visit_id"), "left_semi")

    val nodes = gatedElementNodes.drop("openwpm_tag").unionByName(srcNodes)
      .dropDuplicates()
    val edges = gatedCreateEdges.unionByName(srcEdges)
      .withColumn("reqattr", lit("N/A"))
      .withColumn("respattr", lit("N/A"))
      .withColumn("response_status", lit("N/A"))
      .withColumn("attr", lit("N/A"))
      .withColumn("post_body", lit(null).cast("string"))
      .withColumn("post_body_raw", lit(null).cast("string"))
      .withColumn("content_hash", lit(null).cast("string"))
    (nodes, edges)
  }
}
