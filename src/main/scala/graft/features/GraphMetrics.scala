package graft.features

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-visit structural graph metrics (reference:
  * /root/reference/code/features/structure.py:108-200, SURVEY.md §2.8
  * G1-G8) computed for ALL nodes of ALL visits in a constant number of
  * joins/aggregations — the reference's per-node networkx rescan
  * (O(V) BFS launches per graph) becomes one multi-source dataflow.
  *
  * Semantics pinned to networkx (golden-tested in FeatureSpec):
  *  - closeness_centrality (directed, incoming paths, Wasserman-Faust
  *    scaling): ((r-1)/Σd) · ((r-1)/(n-1)) over nodes that can REACH v;
  *  - average_degree_connectivity (source=target="in+out");
  *  - eccentricity on the undirected copy, -1 sentinel for every node when
  *    the graph is disconnected (§2.11.7);
  *  - ancestors/descendants = directed reachability counts.
  */
object GraphMetrics {

  /** All-pairs BFS distances per visit graph: (visit_id, s, v, dist),
    * dist ≥ 0, pairs limited to reachable ones. Semi-naïve layered
    * expansion — work per superstep ∝ new pairs. */
  def distances(edges: DataFrame, undirected: Boolean,
                maxIter: Int = 64): DataFrame = {
    val base = edges.select(col("visit_id"), col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct()
    val dir =
      if (undirected)
        base.union(base.select(col("visit_id"), col("dst").as("src"),
          col("src").as("dst"))).distinct()
      else base
    val verts = dir.select(col("visit_id"), col("src").as("id"))
      .union(dir.select(col("visit_id"), col("dst").as("id"))).distinct()

    val hops = dir.select(col("visit_id"), col("src").as("v"),
      col("dst").as("w"))

    var known = verts
      .select(col("visit_id"), col("id").as("s"), col("id").as("v"),
        lit(0).as("dist"))
      .persist()
    var frontier = known
    known.count()
    var d = 0
    var more = true
    while (more && d < maxIter) {
      d += 1
      val next = frontier
        .join(hops, Seq("visit_id", "v"))
        .select(col("visit_id"), col("s"), col("w").as("v"))
        .distinct()
        .join(known.select(col("visit_id"), col("s"), col("v")),
          Seq("visit_id", "s", "v"), "left_anti")
        .withColumn("dist", lit(d))
        .persist()
      more = next.count() > 0
      if (more) {
        val k2 = known.union(next).localCheckpoint(true)
        known.unpersist(false)
        known = k2
      }
      frontier.unpersist(false)
      frontier = next
    }
    frontier.unpersist(false)
    known
  }

  private val adKeywords = Seq("ad", "ads", "advert", "popup", "banner",
    "sponsor", "iframe", "googlead", "adsys", "adser", "advertise",
    "redirect", "popunder", "punder", "popout", "click", "track", "play",
    "pop", "prebid", "bid", "pb.min", "affiliate", "ban", "delivery",
    "promo", "tag", "zoneid", "siteid", "pageid", "size", "viewid",
    "zone_id", "google_afc", "google_afs")

  /** has_ad_keyword (features/utils.py:18-43): any keyword substring,
    * case-insensitive, on non-Element/Storage nodes. */
  def hasAdKeyword(name: org.apache.spark.sql.Column,
                   typ: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val hit = adKeywords.map(k => lower(name).contains(k)).reduce(_ || _)
    when(typ =!= "Element" && typ =!= "Storage" && hit, 1).otherwise(0)
  }

  /** Full structural feature table, one row per (visit_id, name) for every
    * node that appears as an edge endpoint (networkx graph = edge list).
    * `nodes` supplies (visit_id, name, type, attr). */
  def structure(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val simple = edges.select(col("visit_id"), col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct().persist()
    val verts = simple.select(col("visit_id"), col("src").as("name"))
      .union(simple.select(col("visit_id"), col("dst").as("name")))
      .distinct().persist()
    val nVerts = verts.groupBy("visit_id").agg(count(lit(1)).as("n"))
    val nEdges = simple.groupBy("visit_id").agg(count(lit(1)).as("m"))

    val outDeg = simple.groupBy(col("visit_id"), col("src").as("name"))
      .agg(count(lit(1)).as("out_degree"))
    val inDeg = simple.groupBy(col("visit_id"), col("dst").as("name"))
      .agg(count(lit(1)).as("in_degree"))
    val degrees = verts
      .join(outDeg, Seq("visit_id", "name"), "left")
      .join(inDeg, Seq("visit_id", "name"), "left")
      .na.fill(0L, Seq("in_degree", "out_degree"))
      .withColumn("in_out_degree", col("in_degree") + col("out_degree"))
      .persist()

    // ---- reachability (directed) --------------------------------------
    val dist = distances(simple, undirected = false).persist()
    val descendants = dist.groupBy(col("visit_id"), col("s").as("name"))
      .agg((count(lit(1)) - 1).as("descendants"))
    val ancestors = dist.groupBy(col("visit_id"), col("v").as("name"))
      .agg((count(lit(1)) - 1).as("ancestors"),
        sum(col("dist")).as("sum_d_in"),
        count(lit(1)).as("r_in"))

    // closeness (nx directed semantics: incoming distances, WF scaling)
    val closeness = ancestors.join(nVerts, "visit_id")
      .withColumn("closeness_centrality",
        when(col("sum_d_in") > 0 && col("n") > 1,
          ((col("r_in") - 1) / col("sum_d_in")) *
            ((col("r_in") - 1) / (col("n") - 1)))
          .otherwise(0.0))
      .select(col("visit_id"), col("name"), col("ancestors"),
        col("closeness_centrality"))

    // ---- eccentricity (undirected; -1 for all if disconnected) --------
    val udist = distances(simple, undirected = true).persist()
    val reachPairs = udist.groupBy("visit_id").agg(count(lit(1)).as("pairs"))
    val connected = reachPairs.join(nVerts, "visit_id")
      .select(col("visit_id"), (col("pairs") === col("n") * col("n")).as("conn"))
    val eccRaw = udist.groupBy(col("visit_id"), col("s").as("name"))
      .agg(max(col("dist")).as("ecc_raw"))
    val eccentricity = eccRaw.join(connected, "visit_id")
      .select(col("visit_id"), col("name"),
        when(col("conn"), col("ecc_raw")).otherwise(-1L).as("eccentricity"))

    // ---- average_degree_connectivity ----------------------------------
    // networkx parity quirk: with source=target="in+out" on a DiGraph,
    // `neighbors` resolves to G.neighbors == successors ONLY, while both
    // degrees and the normalizer use in+out degree:
    //   adc[k] = Σ_{i: k_i=k} Σ_{j∈succ(i)} k_j  /  Σ_{i: k_i=k} k_i
    val degOnly = degrees.select(col("visit_id"), col("name"),
      col("in_out_degree").as("k"))
    val succSum = simple
      .join(degOnly.select(col("visit_id"), col("name").as("src"),
        col("k").as("ku")), Seq("visit_id", "src"))
      .join(degOnly.select(col("visit_id"), col("name").as("dst"),
        col("k").as("kv")), Seq("visit_id", "dst"))
      .groupBy(col("visit_id"), col("src").as("name"))
      .agg(sum(col("kv")).as("s"))
    val nodeS = degOnly.join(succSum, Seq("visit_id", "name"), "left")
      .na.fill(0L, Seq("s"))
    val adc = nodeS.groupBy(col("visit_id"), col("k"))
      .agg((sum(col("s")).cast("double") / sum(col("k")))
        .as("average_degree_connectivity"))

    // ---- 1-hop / ancestor attribute flags -----------------------------
    val typed = nodes.select(col("visit_id"), col("name"), col("type"),
      col("attr")).dropDuplicates("visit_id", "name")
    val evalElem = (col("type") === "Element") &&
      (get_json_object(col("attr"), "$.eval") === "true") &&
      (get_json_object(col("attr"), "$.subtype") === "script")

    val parentFlags = simple
      .join(typed.withColumnRenamed("name", "src"), Seq("visit_id", "src"), "left")
      .groupBy(col("visit_id"), col("dst").as("name"))
      .agg(
        max(when(col("type") === "Script", 1).otherwise(0)).as("is_parent_script"),
        sum(when(col("type") === "Script", 1).otherwise(0)).as("num_script_predecessors"),
        max(when(evalElem, 1).otherwise(0)).as("is_eval_or_function"))
    val childFlags = simple
      .join(typed.withColumnRenamed("name", "dst"), Seq("visit_id", "dst"), "left")
      .groupBy(col("visit_id"), col("src").as("name"))
      .agg(sum(when(col("type") === "Script", 1).otherwise(0)).as("num_script_successors"))

    val ancFlags = dist.where(col("dist") > 0)
      .join(typed.withColumnRenamed("name", "s"), Seq("visit_id", "s"), "left")
      .groupBy(col("visit_id"), col("v").as("name"))
      .agg(
        max(when(col("type") === "Script", 1).otherwise(0)).as("is_ancestor_script"),
        max(when(evalElem, 1).otherwise(0)).as("descendant_of_eval_or_function"),
        max(hasAdKeyword(col("s"), col("type"))).as("ascendant_has_ad_keyword"))

    // ---- assemble ------------------------------------------------------
    val out = degrees
      .join(descendants, Seq("visit_id", "name"), "left")
      .join(closeness, Seq("visit_id", "name"), "left")
      .join(eccentricity, Seq("visit_id", "name"), "left")
      .join(adc.withColumnRenamed("visit_id", "av").withColumnRenamed("k", "ak"),
        col("visit_id") === col("av") && col("in_out_degree") === col("ak"),
        "left")
      .drop("av", "ak")
      .join(parentFlags, Seq("visit_id", "name"), "left")
      .join(childFlags, Seq("visit_id", "name"), "left")
      .join(ancFlags, Seq("visit_id", "name"), "left")
      .join(nVerts, "visit_id").join(nEdges, "visit_id")
      .withColumn("num_nodes", col("n"))
      .withColumn("num_edges", col("m"))
      .withColumn("nodes_div_by_edges",
        col("n") / when(col("m") === 0, 1e-6).otherwise(col("m")))
      .withColumn("edges_div_by_nodes",
        col("m") / when(col("n") === 0, 1e-6).otherwise(col("n")))
      .drop("n", "m")
      .na.fill(0L, Seq("ancestors", "descendants", "is_parent_script",
        "num_script_predecessors", "is_eval_or_function",
        "num_script_successors", "is_ancestor_script",
        "descendant_of_eval_or_function", "ascendant_has_ad_keyword"))
      .na.fill(0.0, Seq("closeness_centrality"))

    Seq(simple, verts, degrees, dist, udist).foreach(_.unpersist(false))
    out
  }
}
