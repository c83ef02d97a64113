package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The per-node feature matrix + labelling (reference:
  * /root/reference/code/features/feature_extraction.py:56-105 and
  * /root/reference/code/labelling/node_labelling.py — SURVEY.md §1.1
  * "third abstraction", §2.2 P9).
  *
  * One wide DataFrame from three fused layers (structure ⋈ dataflow ⋈
  * content), restricted to classifiable nodes: type ∉ {Element, Storage}
  * and attr ≠ "inline" (feature_extraction.py:90). The reference loops
  * per node; here the whole matrix is a constant-depth join tree.
  */
object FeatureExtraction {

  def classifiable(nodes: DataFrame): DataFrame =
    nodes.where(!col("type").isin("Element", "Storage") &&
      (col("attr").isNull || col("attr") =!= "inline"))

  /** The reference's −1-defaulted column families (features absent when the
    * node is missing from the relevant graph / has no qualifying rows —
    * dataflow.py:124-136,213-219; additional.py:72-86,112-117). */
  private val minusOneCols = Seq(
    "indirect_in_degree", "indirect_out_degree", "indirect_ancestors",
    "indirect_descendants", "indirect_closeness_centrality",
    "indirect_average_degree_connectivity", "indirect_eccentricity",
    "indirect_mean_in_weights", "indirect_min_in_weights",
    "indirect_max_in_weights", "indirect_mean_out_weights",
    "indirect_min_out_weights", "indirect_max_out_weights",
    "indirect_all_in_degree", "indirect_all_out_degree",
    "indirect_all_ancestors", "indirect_all_descendants",
    "indirect_all_closeness_centrality",
    "indirect_all_average_degree_connectivity", "indirect_all_eccentricity",
    "max_size_name", "max_size_val", "min_size_name", "min_size_val",
    "mean_size_name", "mean_size_val",
    "max_rec_response_length", "min_rec_response_length",
    "mean_rec_response_length", "max_size_response", "min_size_response",
    "mean_size_response")

  /** nodes: consolidated unified node table (GraphAssembly.unifiedGraph);
    * edges: unified edge table; content: optional (content_hash, body)
    * table (the reference's LevelDB script store, SURVEY §2.1 S3) feeding
    * the ascendant_script_* features.
    *
    * Inputs are materialized first (localCheckpoint): the graph table is
    * the stable IR between construction and feature extraction — exactly
    * the reference's graph.csv handoff (run_extraction.py:253, SURVEY.md
    * §3 E2). Without the cut, the feature layers each re-embed the
    * whole construction plan and the combined tree explodes. At durable
    * scale this is a parquet/Iceberg write (graft.checkpoint).
    *
    * Emits the full features.yaml:78-139 column set (structure + dataflow
    * incl. the indirect / indirect_all graph families) plus the
    * "additional" family (cookie / response / cs-edge / diff-domain) and
    * the content lexical features. One reachability core is shared by the
    * structure, diff-domain, and script-content families; the indirect and
    * composed graphs get their own (they are different graphs). */
  def features(nodes: DataFrame, edges: DataFrame,
               content: Option[DataFrame] = None): DataFrame = {
    val n = nodes.localCheckpoint(true)
    val e = edges.localCheckpoint(true)

    val core = GraphMetrics.coreMetrics(e)
    val s = GraphMetrics.structureFrom(n, core)
    val d = DataflowFeatures.dataflow(e)
    val c = ContentFeatures.content(n)

    // indirect edge IR, built once and shared by counts/weights/metrics;
    // set_url targets are the reference's Request/Script/Document node
    // names (utils.py:444-448), not the edge-derived approximation
    val urlTargets = n
      .where(col("type").isin("Request", "Script", "Document"))
      .select(col("visit_id"), col("name").as("url"))
    val ind = IndirectEdges.build(e, Some(urlTargets)).localCheckpoint(true)
    val indCounts = IndirectEdges.counts(ind)
    val indWeights = IndirectEdges.weights(ind)
    // nx.compose(G, G_indirect) (dataflow.py:302) = union of edge sets.
    // Union the RAW direct edges, not core.simple: simple strips
    // self-loops, but the direct graph routinely has them (the main-frame
    // normal edge is top_level_url → itself) and nx keeps them — a page
    // node whose only edge is that self-loop must stay in the composed
    // graph. indirect + composed metrics share ONE superstep loop.
    val composed = e.select(col("visit_id"), col("src"), col("dst"))
      .unionByName(ind.select(col("visit_id"), col("src"), col("dst")))
    val (indMetrics, indAllMetrics) =
      GraphMetrics.indirectAndComposedMetrics(ind, composed)

    val cookie = AdditionalFeatures.cookieStats(e, n)
    val resp = AdditionalFeatures.responseStats(e)
    val csCounts = AdditionalFeatures.edgeCounts(e)
    val dd = AdditionalFeatures.diffDomainCounts(n, core.simple, core.dist)
    val sc = content.map(ct =>
      AdditionalFeatures.scriptContent(n, e, core.dist, ct))

    val base = classifiable(n)
      .select(col("visit_id"), col("name"), col("top_level_url"))
      .join(s, Seq("visit_id", "name"), "left")
      .join(d, Seq("visit_id", "name"), "left")
      .join(c, Seq("visit_id", "name"), "left")
      .join(indCounts, Seq("visit_id", "name"), "left")
      .join(indWeights, Seq("visit_id", "name"), "left")
      .join(indMetrics, Seq("visit_id", "name"), "left")
      .join(indAllMetrics, Seq("visit_id", "name"), "left")
      .join(cookie, Seq("visit_id", "name"), "left")
      .join(resp, Seq("visit_id", "name"), "left")
      .join(csCounts, Seq("visit_id", "name"), "left")
      .join(dd, Seq("visit_id", "name"), "left")
    val withSc = sc.fold(
      base.withColumn("ascendant_script_has_eval_or_function", lit(0))
        .withColumn("ascendant_script_has_fp_keyword", lit(0))
        .withColumn("ascendant_script_length", lit(0)))(t =>
      base.join(t, Seq("visit_id", "name"), "left"))

    val out = withSc
      .na.fill(-1L, minusOneCols).na.fill(-1.0, minusOneCols)
      .na.fill(0L).na.fill(0.0)
    core.release()
    out
  }

}
