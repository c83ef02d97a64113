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

  /** nodes: consolidated unified node table (GraphAssembly.unifiedGraph);
    * edges: unified edge table.
    *
    * Inputs are materialized first (localCheckpoint): the graph table is
    * the stable IR between construction and feature extraction — exactly
    * the reference's graph.csv handoff (run_extraction.py:253, SURVEY.md
    * §3 E2). Without the cut, the three feature layers each re-embed the
    * whole construction plan and the combined tree explodes. At durable
    * scale this is a parquet/Iceberg write (graft.checkpoint). */
  def features(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val n = nodes.localCheckpoint(true)
    val e = edges.localCheckpoint(true)
    val s = GraphMetrics.structure(n, e)
    val d = DataflowFeatures.dataflow(e)
    val c = ContentFeatures.content(n)
    val i = IndirectEdges.counts(e)
    classifiable(n)
      .select(col("visit_id"), col("name"), col("top_level_url"))
      .join(s, Seq("visit_id", "name"), "left")
      .join(d, Seq("visit_id", "name"), "left")
      .join(c, Seq("visit_id", "name"), "left")
      .join(i, Seq("visit_id", "name"), "left")
  }

  /** Filter-list labelling as a pattern-table join (the adblock-rule DSL is
    * out of engine scope, SURVEY.md §7.5; a pattern table reproduces the
    * test-relevant behavior): label = true iff any pattern is a substring
    * of the node url (A11 disjunction across lists). */
  def label(nodes: DataFrame, patterns: DataFrame): DataFrame = {
    val p = broadcast(patterns.select(col("pattern")))
    classifiable(nodes)
      .select(col("visit_id"), col("top_level_url"), col("name"))
      .join(p, col("name").contains(col("pattern")), "left")
      .groupBy(col("visit_id"), col("top_level_url"), col("name"))
      .agg(max(when(col("pattern").isNotNull, lit(true)).otherwise(lit(false)))
        .as("label"))
  }
}
