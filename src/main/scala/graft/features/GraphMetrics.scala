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
  *
  * The metric core is shared between the DIRECT graph ([[structure]]) and
  * the indirect / composed graphs of the dataflow feature family
  * ([[indirectMetrics]] — reference dataflow.py:110-245).
  */
object GraphMetrics {

  /** All-pairs BFS distances per visit graph: (visit_id, s, v, dist),
    * dist ≥ 0, pairs limited to reachable ones. Semi-naïve layered
    * expansion — work per superstep ∝ new pairs.
    *
    * Every loop-carried table is an EAGER localCheckpoint, so each
    * superstep plans over three leaves (frontier, hops, known). With a
    * merely-persisted frontier the level-d logical plan chains through all
    * d−1 previous levels and re-embeds the full upstream construction tree
    * via `hops` — O(d²) live plan nodes across the loop, which is what
    * actually blew the 8 GB driver heap in the large-diameter sf0.001
    * regime (the pair DATA there is a few MB), and what made deep loops
    * pay quadratic re-analysis time. */
  def distances(edges: DataFrame, undirected: Boolean,
                maxIter: Int = 64): DataFrame = {
    val base = edges.select(col("visit_id"), col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct()
    val dir =
      if (undirected)
        base.union(base.select(col("visit_id"), col("dst").as("src"),
          col("src").as("dst"))).distinct()
      else base

    // plan leaf: consumed once per superstep — without truncation each
    // level's plan would carry its own copy of the whole upstream tree
    val hops = dir.select(col("visit_id"), col("src").as("v"),
      col("dst").as("w")).localCheckpoint(true)

    var known = hops.select(col("visit_id"), col("v").as("id"))
      .union(hops.select(col("visit_id"), col("w").as("id"))).distinct()
      .select(col("visit_id"), col("id").as("s"), col("id").as("v"),
        lit(0).as("dist"))
      .localCheckpoint(true)
    var frontier = known
    var completed = false
    try {
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
          .localCheckpoint(true)
        more = next.count() > 0
        // superseded checkpoints are released NOW — Dataset.unpersist no-ops
        // on them (graft.core.Checkpoints doc) and waiting on driver GC +
        // ContextCleaner leaves O(diameter) dead state copies pinned. `next`
        // is eager, so the old frontier is never read again; guard the
        // first-step alias (frontier starts as `known` itself).
        if (frontier ne known) graft.core.Checkpoints.release(frontier)
        if (more) {
          val grown = known.union(next).localCheckpoint(true)
          graft.core.Checkpoints.release(known)
          known = grown
        }
        frontier = next
      }
      if (more)
        // loud failure beats silent truncation (same policy as
        // Reachability.closure): a diameter beyond maxIter would otherwise
        // yield quietly-wrong eccentricity/closeness/reachability counts
        throw new IllegalStateException(
          s"all-pairs expansion did not converge in $maxIter supersteps " +
            "(graph diameter exceeds the bound) — raise maxIter")
      completed = true
      known
    } finally {
      if (frontier ne known) graft.core.Checkpoints.release(frontier)
      graft.core.Checkpoints.release(hops) // loop leaf; `known` independent
      // abort path (count() failure, non-convergence throw): `known` — the
      // largest object in the loop — can never be read again; release it
      if (!completed) graft.core.Checkpoints.release(known)
    }
  }

  /** has_ad_keyword (features/utils.py:18-43): any keyword match on
    * non-Element/Storage nodes. The reference runs `re.finditer(key, url,
    * re.I)` — REGEX semantics ("pb.min"'s dot is a wildcard) — and the
    * list is the shared [[ContentFeatures.keywordRaw]] constant (the
    * reference repeats it verbatim at utils.py:30-32 / content.py:21-23). */
  def hasAdKeyword(name: org.apache.spark.sql.Column,
                   typ: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val hit = ContentFeatures.keywordRaw
      .map(k => name.rlike("(?i)" + k)).reduce(_ || _)
    when(typ =!= "Element" && typ =!= "Storage" && hit, 1).otherwise(0)
  }

  /** Intermediate bundle from [[coreMetrics]]: `metrics` is the assembled
    * per-node table; the rest are the persisted building blocks callers may
    * reuse (direct distances feed the ancestor flags and the diff-domain
    * ancestor counts). `release()` drops the caches. */
  private[features] final case class CoreMetrics(
      simple: DataFrame, simpleAll: DataFrame, verts: DataFrame,
      degrees: DataFrame, dist: DataFrame, nVerts: DataFrame,
      nEdges: DataFrame, metrics: DataFrame, release: () => Unit)

  /** Per-node metric core over one edge set (direct, indirect, or composed
    * graph — they share ALL metric semantics): in/out/in+out degree,
    * ancestors/descendants (directed reachability), closeness (incoming,
    * WF-scaled), eccentricity (undirected, -1 if disconnected), average
    * degree connectivity (nx in+out quirk: neighbors = successors only). */
  private[features] def coreMetrics(edges: DataFrame): CoreMetrics = {
    // nx DiGraph parity: self-loops (a script setting AND getting its own
    // cookie — routine in the indirect graphs) count in degrees and ADC but
    // never in shortest paths (d(n,n)=0 regardless).
    val simpleAll = edges.select(col("visit_id"), col("src"), col("dst"))
      .distinct().persist()
    val simple = simpleAll.where(col("src") =!= col("dst")).persist()
    val verts = simpleAll.select(col("visit_id"), col("src").as("name"))
      .union(simpleAll.select(col("visit_id"), col("dst").as("name")))
      .distinct().persist()
    val nVerts = verts.groupBy("visit_id").agg(count(lit(1)).as("n"))
    val nEdges = simpleAll.groupBy("visit_id").agg(count(lit(1)).as("m"))

    val outDeg = simpleAll.groupBy(col("visit_id"), col("src").as("name"))
      .agg(count(lit(1)).as("out_degree"))
    val inDeg = simpleAll.groupBy(col("visit_id"), col("dst").as("name"))
      .agg(count(lit(1)).as("in_degree"))
    val degrees = verts
      .join(outDeg, Seq("visit_id", "name"), "left")
      .join(inDeg, Seq("visit_id", "name"), "left")
      .na.fill(0L, Seq("in_degree", "out_degree"))
      .withColumn("in_out_degree", col("in_degree") + col("out_degree"))
      .persist()

    // ---- reachability: directed + undirected in ONE superstep loop ----
    // Same composite-visit fusion as [[indirectAndComposedMetrics]]: the
    // two expansions never interact, so the graph tag is plain data
    // parallelism and the loop pays max(depth_dir, depth_und) barriers
    // instead of their sum — at cluster scale every barrier is a full
    // shuffle round-trip, so this halves the critical path of the metric
    // core (closeness/ancestors need directed pairs, eccentricity the
    // undirected ones).
    def tagged(df: DataFrame, g: String) = df.select(
      struct(lit(g).as("g"), col("visit_id").as("v")).as("visit_id"),
      col("src"), col("dst"))
    val sym = simple.union(simple.select(col("visit_id"),
      col("dst").as("src"), col("src").as("dst")))
    // distances() already returns an eagerly-stored localCheckpoint leaf
    // (MEMORY_AND_DISK blocks) — re-reads by the slices below hit the block
    // manager directly. A persist() on top would ADD an InMemoryRelation
    // COPY of the full fused all-pairs table, and its Dataset.unpersist in
    // release() would drop only that copy while the checkpoint blocks
    // stayed pinned (the silent-no-op class Checkpoints documents).
    val bothDist = distances(
      tagged(simple, "d").unionByName(tagged(sym, "u")),
      undirected = false)
    def distSlice(g: String) = bothDist.where(col("visit_id.g") === g)
      .select(col("visit_id.v").as("visit_id"), col("s"), col("v"),
        col("dist"))
    val dist = distSlice("d")
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
    val udist = distSlice("u")
    val reachPairs = udist.groupBy("visit_id").agg(count(lit(1)).as("pairs"))
    // anchor on nVerts (covers visits whose edges are ALL self-loops —
    // udist is empty there): connected iff reachable pairs = n², or the
    // graph is a single node (nx eccentricity 0); n≥2 with no non-self
    // edges is disconnected → -1 for every node, matching nx's raise
    val connected = nVerts.join(reachPairs, Seq("visit_id"), "left")
      .select(col("visit_id"),
        (coalesce(col("pairs"), lit(0L)) === col("n") * col("n") ||
          col("n") === 1).as("conn"))
    val eccRaw = udist.groupBy(col("visit_id"), col("s").as("name"))
      .agg(max(col("dist")).as("ecc_raw"))
    // left join over ALL verts: a node touching only self-loops has no
    // distance rows but still has eccentricity 0 (or -1 if disconnected)
    val eccentricity = verts.join(eccRaw, Seq("visit_id", "name"), "left")
      .join(connected, "visit_id")
      .select(col("visit_id"), col("name"),
        when(col("conn"), coalesce(col("ecc_raw"), lit(0L))).otherwise(-1L)
          .as("eccentricity"))

    // ---- average_degree_connectivity ----------------------------------
    // networkx parity quirk: with source=target="in+out" on a DiGraph,
    // `neighbors` resolves to G.neighbors == successors ONLY, while both
    // degrees and the normalizer use in+out degree:
    //   adc[k] = Σ_{i: k_i=k} Σ_{j∈succ(i)} k_j  /  Σ_{i: k_i=k} k_i
    val degOnly = degrees.select(col("visit_id"), col("name"),
      col("in_out_degree").as("k"))
    val succSum = simpleAll // self-loop ⇒ the node is its own successor (nx)
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

    val metrics = degrees
      .join(descendants, Seq("visit_id", "name"), "left")
      .join(closeness, Seq("visit_id", "name"), "left")
      .join(eccentricity, Seq("visit_id", "name"), "left")
      .join(adc.withColumnRenamed("visit_id", "av").withColumnRenamed("k", "ak"),
        col("visit_id") === col("av") && col("in_out_degree") === col("ak"),
        "left")
      .drop("av", "ak")
      .na.fill(0L, Seq("ancestors", "descendants"))
      .na.fill(0.0, Seq("closeness_centrality"))

    // release() drops only the persist() CACHES: callers (structure,
    // FeatureExtraction) call it right after BUILDING their lazy output
    // plans, which still read bothDist's checkpoint blocks when consumed —
    // releasing those here would fail every later read
    // (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND). The checkpoint leaf is scratch
    // by the repo policy: the consuming entry points (Bench/Verify/Demo)
    // sweep it after full consumption; library embedders release it via
    // Checkpoints.releaseLeaves on the consumed output.
    CoreMetrics(simple, simpleAll, verts, degrees, dist, nVerts, nEdges, metrics,
      () => Seq(simpleAll, simple, verts, degrees).foreach(_.unpersist(false)))
  }

  /** Full structural feature table, one row per (visit_id, name) for every
    * node that appears as an edge endpoint (networkx graph = edge list).
    * `nodes` supplies (visit_id, name, type, attr). */
  def structure(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val c = coreMetrics(edges)
    val out = structureFrom(nodes, c)
    c.release()
    out
  }

  /** [[structure]] body over an already-built core — lets
    * [[FeatureExtraction]] share one core (simple digraph + reachability
    * pairs) with the diff-domain and script-content families instead of
    * recomputing the all-pairs BFS. Does NOT release the core. */
  private[features] def structureFrom(nodes: DataFrame,
                                      c: CoreMetrics): DataFrame = {

    // ---- 1-hop / ancestor attribute flags -----------------------------
    val typed = nodes.select(col("visit_id"), col("name"), col("type"),
      col("attr")).dropDuplicates("visit_id", "name")
    graft.ext.GraftExtensions.register(nodes.sparkSession)
    val evalElem = (col("type") === "Element") &&
      (call_function("json_get", col("attr"), lit("eval")) === "true") &&
      (call_function("json_get", col("attr"), lit("subtype")) === "script")

    // 1-hop flags over simpleAll: nx G.predecessors/successors include the
    // node itself on a self-loop (the direct graph routinely carries them),
    // while the ancestor flags stay on dist, which never pairs self-self
    val parentFlags = c.simpleAll
      .join(typed.withColumnRenamed("name", "src"), Seq("visit_id", "src"), "left")
      .groupBy(col("visit_id"), col("dst").as("name"))
      .agg(
        max(when(col("type") === "Script", 1).otherwise(0)).as("is_parent_script"),
        sum(when(col("type") === "Script", 1).otherwise(0)).as("num_script_predecessors"),
        max(when(evalElem, 1).otherwise(0)).as("is_eval_or_function"))
    val childFlags = c.simpleAll
      .join(typed.withColumnRenamed("name", "dst"), Seq("visit_id", "dst"), "left")
      .groupBy(col("visit_id"), col("src").as("name"))
      .agg(sum(when(col("type") === "Script", 1).otherwise(0)).as("num_script_successors"))

    val ancFlags = c.dist.where(col("dist") > 0)
      .join(typed.withColumnRenamed("name", "s"), Seq("visit_id", "s"), "left")
      .groupBy(col("visit_id"), col("v").as("name"))
      .agg(
        max(when(col("type") === "Script", 1).otherwise(0)).as("is_ancestor_script"),
        max(when(evalElem, 1).otherwise(0)).as("descendant_of_eval_or_function"),
        max(hasAdKeyword(col("s"), col("type"))).as("ascendant_has_ad_keyword"))

    // ---- assemble ------------------------------------------------------
    val out = c.metrics
      .join(parentFlags, Seq("visit_id", "name"), "left")
      .join(childFlags, Seq("visit_id", "name"), "left")
      .join(ancFlags, Seq("visit_id", "name"), "left")
      .join(c.nVerts, "visit_id").join(c.nEdges, "visit_id")
      .withColumn("num_nodes", col("n"))
      .withColumn("num_edges", col("m"))
      .withColumn("nodes_div_by_edges",
        col("n") / when(col("m") === 0, 1e-6).otherwise(col("m")))
      .withColumn("edges_div_by_nodes",
        col("m") / when(col("n") === 0, 1e-6).otherwise(col("n")))
      .drop("n", "m")
      .na.fill(0L, Seq("is_parent_script",
        "num_script_predecessors", "is_eval_or_function",
        "num_script_successors", "is_ancestor_script",
        "descendant_of_eval_or_function", "ascendant_has_ad_keyword"))

    out
  }

  /** Per-node metrics over an INDIRECT or COMPOSED edge set with the
    * reference's out_degree := in_degree quirk (dataflow.py:158-159 and
    * 223-224 call `G.in_degree` for both) and a column prefix
    * (`indirect_` / `indirect_all_`). Only nodes present in the edge set
    * get rows — the caller left-joins and fills the reference's −1 default
    * for absent nodes (dataflow.py:124-130, 213-219). */
  def indirectMetrics(edges: DataFrame, prefix: String): DataFrame = {
    val c = coreMetrics(edges)
    val out = renamed(c.metrics, col("visit_id"), prefix)
    c.release()
    out
  }

  private def renamed(m: DataFrame, visit: org.apache.spark.sql.Column,
                      prefix: String): DataFrame =
    m.select(
      visit.as("visit_id"), col("name"),
      col("in_degree").as(s"${prefix}in_degree"),
      col("in_degree").as(s"${prefix}out_degree"), // reference quirk
      col("ancestors").as(s"${prefix}ancestors"),
      col("descendants").as(s"${prefix}descendants"),
      col("closeness_centrality").as(s"${prefix}closeness_centrality"),
      col("average_degree_connectivity")
        .as(s"${prefix}average_degree_connectivity"),
      col("eccentricity").as(s"${prefix}eccentricity"))

  /** [[indirectMetrics]] for the indirect AND composed graphs in ONE shared
    * superstep loop: the two edge sets are tagged into a composite visit
    * key, so the iterative all-pairs expansion runs once over both — the
    * graph id is plain data parallelism instead of a second sequential
    * driver loop (2× fewer iterative jobs; at cluster scale, 2× fewer
    * full shuffle barriers). Returns (indirect_*, indirect_all_*). */
  def indirectAndComposedMetrics(ind: DataFrame,
                                 composed: DataFrame): (DataFrame, DataFrame) = {
    def pack(df: DataFrame, tag: String) = df.select(
      struct(lit(tag).as("g"), col("visit_id").as("v")).as("visit_id"),
      col("src"), col("dst"))
    val c = coreMetrics(pack(ind, "i").unionByName(pack(composed, "c")))
    def slice(tag: String, prefix: String) =
      renamed(c.metrics.where(col("visit_id.g") === tag),
        col("visit_id.v"), prefix)
    val out = (slice("i", "indirect_"), slice("c", "indirect_all_"))
    c.release()
    out
  }
}
