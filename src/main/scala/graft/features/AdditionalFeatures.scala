package graft.features

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's "additional" feature families
  * (/root/reference/code/features/additional.py) and the script-content
  * features (/root/reference/code/features/structure.py:8-64) — cookie
  * attribute stats, response content-length stats, call-stack edge counts,
  * created-element counts, cross-domain neighbor counts, and ancestor
  * script-body predicates via the content table (SURVEY.md §2.1 S3: the
  * reference's LevelDB point-gets become one equi join on content_hash).
  *
  * Every family is a fused conditional aggregation over one edge direction
  * (SURVEY §2.4 A8) — never a per-node rescan. Defaults follow the
  * reference: stats −1 when a node has no qualifying rows, counts 0;
  * the caller ([[FeatureExtraction]]) applies them after its left joins.
  */
object AdditionalFeatures {

  /** Canvas-fingerprinting keywords (structure.py:24-27). */
  private val fpKeywords = Seq("CanvasRenderingContext2D", "HTMLCanvasElement",
    "toDataURL", "getImageData", "measureText", "font", "fillText",
    "strokeText", "fillStyle", "strokeStyle",
    "HTMLCanvasElement.addEventListener", "save", "restore")

  /** Null-safe "domains differ" — python `x != node_ps1` where None != None
    * is False but str != None is True. */
  private def domainDiffers(a: Column, b: Column): Column = !(a <=> b)

  /** Cookie-set attribute stats per SETTER node (additional.py:98-160):
    * name/value length stats, httponly count, cookie-domain ≠ node
    * top_level_domain count. `nodes` supplies (visit_id, name,
    * top_level_domain) for the setter. */
  def cookieStats(edges: DataFrame, nodes: DataFrame): DataFrame = {
    graft.ext.GraftExtensions.register(edges.sparkSession)
    // four attr fields per row: native json_get (one structural scan each)
    // instead of get_json_object's per-row-per-call Jackson parser
    def jget(f: String) = call_function("json_get", col("attr"), lit(f))
    val sets = edges
      .where(col("action").isin("set", "set_js"))
      .select(col("visit_id"), col("src"), col("attr"))
      // reference gate: skip any attr whose STRING contains "N/A"
      // (additional.py:129), then json.loads with 'name' required. A row
      // with name but NO value still contributes size_name — the python
      // loop appends len(attr['name']) BEFORE the KeyError on
      // attr['value'] and try doesn't roll the append back
      // (additional.py:131-136, §2.11.6 swallow semantics).
      .withColumn("c_name", jget("name"))
      .withColumn("c_value", jget("value"))
      .withColumn("c_httponly", jget("httponly"))
      .withColumn("c_domain", jget("domain"))
      .where(!col("attr").contains("N/A") && col("c_name").isNotNull)
      .withColumn("size_name", length(col("c_name")))
      // 'none' anywhere in the value (case-insens) zeroes its size
      // (additional.py:133-136); null where the value is absent
      .withColumn("size_val",
        when(col("c_value").isNull, lit(null).cast("int"))
          .when(lower(col("c_value")).contains("none"), 0)
          .otherwise(length(col("c_value"))))
    val hasVal = col("c_value").isNotNull
    sets
      .join(nodes.select(col("visit_id"), col("name").as("src"),
        col("top_level_domain")), Seq("visit_id", "src"), "left")
      .groupBy(col("visit_id"), col("src").as("name"))
      .agg(
        max(col("size_name")).as("sn_max"),
        min(col("size_name")).as("sn_min"),
        avg(col("size_name")).as("sn_mean"),
        max(col("size_val")).as("max_size_val"),
        min(col("size_val")).as("min_size_val"),
        avg(col("size_val")).as("mean_size_val"),
        count(col("size_val")).as("n_val"),
        // httponly / domain checks sit AFTER the value read in the
        // reference loop — value-less rows never reach them
        sum(when(hasVal && col("c_httponly") === "true", 1L).otherwise(0L))
          .as("num_httponly"),
        // cookie domain minus its leading '.' vs the node's site
        // (additional.py:139-143). The reference throws (and skips) only
        // when the node lacks the attribute KEY; a NaN top_level_domain
        // compares unequal to any string and INCREMENTS — null-safe
        // inequality, so null TLD counts as different
        sum(when(hasVal && col("c_domain").isNotNull &&
          !(expr("substring(c_domain, 2)") <=> col("top_level_domain")), 1L)
          .otherwise(0L)).as("num_diff_domain"))
      // reference emits the six size stats only when BOTH lists are
      // non-empty (additional.py:147-153); size_name alone stays −1
      .select(col("visit_id"), col("name"),
        when(col("n_val") > 0, col("sn_max")).as("max_size_name"),
        when(col("n_val") > 0, col("max_size_val")).as("max_size_val"),
        when(col("n_val") > 0, col("sn_min")).as("min_size_name"),
        when(col("n_val") > 0, col("min_size_val")).as("min_size_val"),
        when(col("n_val") > 0, col("sn_mean")).as("mean_size_name"),
        when(col("n_val") > 0, col("mean_size_val")).as("mean_size_val"),
        col("num_httponly"), col("num_diff_domain"))
  }

  /** Response content-length stats (additional.py:60-96): clength pulled
    * from the edge attr JSON; zero/absent lengths dropped (python
    * `filter(None, …)` drops 0 too). src side = *_rec_response_length,
    * dst side = *_size_response (the reference's naming, kept as-is). */
  def responseStats(edges: DataFrame): DataFrame = {
    graft.ext.GraftExtensions.register(edges.sparkSession)
    // pandas NaN != "N/A" is True ⇒ null respattr PASSES the filter
    val valid = col("attr").isNotNull && col("attr") =!= "CS" &&
      col("attr") =!= "N/A" && length(col("attr")) > 0 &&
      (col("respattr").isNull || col("respattr") =!= "N/A")
    val cl = edges.where(valid)
      .select(col("visit_id"), col("src"), col("dst"),
        call_function("json_get", col("attr"), lit("clength"))
          .cast("long").as("clength"))
      .where(col("clength").isNotNull && col("clength") =!= 0L)
    val bySrc = cl.groupBy(col("visit_id"), col("src").as("name"))
      .agg(max(col("clength")).as("max_rec_response_length"),
        min(col("clength")).as("min_rec_response_length"),
        avg(col("clength")).as("mean_rec_response_length"))
    val byDst = cl.groupBy(col("visit_id"), col("dst").as("name"))
      .agg(max(col("clength")).as("max_size_response"),
        min(col("clength")).as("min_size_response"),
        avg(col("clength")).as("mean_size_response"))
    bySrc.join(byDst, Seq("visit_id", "name"), "full_outer")
  }

  /** Call-stack edge counts + created-element counts per node
    * (additional.py:9-30) — multi-edge row counts, one fused agg per
    * direction. */
  def edgeCounts(edges: DataFrame): DataFrame = {
    val isCs = (col("reqattr") === "CS") || (col("attr") === "CS")
    val bySrc = edges.groupBy(col("visit_id"), col("src").as("name"))
      .agg(sum(when(isCs, 1L).otherwise(0L)).as("num_cs_edges_sent"),
        sum(when(col("action") === "create", 1L).otherwise(0L))
          .as("num_created_elements"))
    val byDst = edges.groupBy(col("visit_id"), col("dst").as("name"))
      .agg(sum(when(isCs, 1L).otherwise(0L)).as("num_cs_edges_rec"))
    bySrc.join(byDst, Seq("visit_id", "name"), "full_outer").na.fill(0L)
  }

  /** Cross-domain neighbor counts (additional.py:32-46): predecessors /
    * successors over the simple digraph, ancestors / descendants over the
    * reachability pairs, each counting neighbors whose `domain` differs
    * from the node's (null-safe, python != semantics). */
  def diffDomainCounts(nodes: DataFrame, simple: DataFrame,
                       dist: DataFrame): DataFrame = {
    val doms = nodes.select(col("visit_id"), col("name"), col("domain"))
      .dropDuplicates("visit_id", "name")
    def d(as: String) = doms.select(col("visit_id"),
      col("name").as(as), col("domain").as(s"${as}_dom"))

    val hop = simple
      .join(d("src"), Seq("visit_id", "src"), "left")
      .join(d("dst"), Seq("visit_id", "dst"), "left")
    val preds = hop.groupBy(col("visit_id"), col("dst").as("name"))
      .agg(sum(when(domainDiffers(col("src_dom"), col("dst_dom")), 1L)
        .otherwise(0L)).as("num_diff_domain_predecessors"))
    val succs = hop.groupBy(col("visit_id"), col("src").as("name"))
      .agg(sum(when(domainDiffers(col("dst_dom"), col("src_dom")), 1L)
        .otherwise(0L)).as("num_diff_domain_successors"))

    val pairs = dist.where(col("dist") > 0)
      .join(d("s"), Seq("visit_id", "s"), "left")
      .join(d("v"), Seq("visit_id", "v"), "left")
    val ancs = pairs.groupBy(col("visit_id"), col("v").as("name"))
      .agg(sum(when(domainDiffers(col("s_dom"), col("v_dom")), 1L)
        .otherwise(0L)).as("num_diff_domain_ancestors"))
    val descs = pairs.groupBy(col("visit_id"), col("s").as("name"))
      .agg(sum(when(domainDiffers(col("v_dom"), col("s_dom")), 1L)
        .otherwise(0L)).as("num_diff_domain_descendants"))

    preds.join(succs, Seq("visit_id", "name"), "full_outer")
      .join(ancs, Seq("visit_id", "name"), "full_outer")
      .join(descs, Seq("visit_id", "name"), "full_outer")
      .na.fill(0L)
  }

  /** Ancestor script-body features (structure.py:8-64, S3): for each node,
    * over its ancestors of type Script, join each script's content_hash
    * (first qualifying edge row; deterministic MIN instead of the
    * reference's input-order iloc[0]) to the content table and test the
    * bodies: eval/function presence, canvas-fp keyword presence, length of
    * the longest ancestor script. Per-hash body predicates are computed
    * ONCE per distinct hash (the content side never re-scans per node —
    * at corpus scale this is the join-not-point-get shape of SURVEY §2.1
    * S3). `content` = (content_hash, body). */
  def scriptContent(nodes: DataFrame, edges: DataFrame, dist: DataFrame,
                    content: DataFrame): DataFrame = {
    val scripts = nodes.where(col("type") === "Script")
      .select(col("visit_id"), col("name")).dropDuplicates()
    val hashPerScript = edges
      .where(col("content_hash").isNotNull && col("content_hash") =!= "N/A")
      .groupBy(col("visit_id"), col("dst").as("name"))
      .agg(min(col("content_hash")).as("content_hash"))
      .join(scripts, Seq("visit_id", "name"), "left_semi")
    val bodyFeats = content
      .where(length(col("body")) > 0)
      .select(col("content_hash"),
        length(col("body")).as("clen"),
        (col("body").contains("eval") || col("body").contains("function"))
          .as("has_eval"),
        fpKeywords.map(k => col("body").contains(k)).reduce(_ || _)
          .as("has_fp"))
      .dropDuplicates("content_hash")
    dist.where(col("dist") > 0)
      .select(col("visit_id"), col("s").as("name"), col("v"))
      .join(hashPerScript, Seq("visit_id", "name"))
      // no forced broadcast: the content table is corpus-sized at scale —
      // AQE picks broadcast only when the distinct-hash side is small
      .join(bodyFeats, Seq("content_hash"))
      .groupBy(col("visit_id"), col("v").as("name"))
      .agg(
        max(when(col("has_eval"), 1).otherwise(0))
          .as("ascendant_script_has_eval_or_function"),
        max(when(col("has_fp"), 1).otherwise(0))
          .as("ascendant_script_has_fp_keyword"),
        max(col("clen")).as("ascendant_script_length"))
  }
}
