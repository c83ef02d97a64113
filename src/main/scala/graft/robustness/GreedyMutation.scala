package graft.robustness

import org.apache.spark.ml.classification.RandomForestClassificationModel
import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.features.FeatureExtraction

/** Greedy classifier-evasion search (reference:
  * /root/reference/robustness/structure_mutation/greedy_mutation.py:26-160 +
  * mutate_styles.py — SURVEY.md §3 E4): per iteration, generate candidate
  * mutated graphs (node addition under sampled adversary parents, storage-
  * edge removal, URL obfuscation), run the full distributed feature
  * extraction + classification on each, score desired−undesired prediction
  * flips against the baseline predictions
  * (mutate_utils.py:466-507), keep the max-diff candidate, repeat.
  *
  * Engine framing: the loop is driver-side bookkeeping over a handful of
  * node names; every candidate evaluation is a full distributed feature job
  * (the reference's extract_and_classify). Deterministic where the
  * reference samples: candidate order, fake-child names and attribute
  * payloads derive from a seeded hash, so trajectories are reproducible —
  * `random_state`-style determinism rather than wall-clock randomness.
  */
object GreedyMutation {

  /** A trained prediction function over the engine's feature matrix —
    * stands in for the reference's joblib-loaded clf. */
  final case class Predictor(model: RandomForestClassificationModel,
                             featCols: Array[String]) {
    /** features → (visit_id, name, pred: Double). Delegates to
      * [[graft.classification.Classify.predict]] so the assemble/fill
      * contract cannot diverge between evasion scoring and the
      * classification pipeline. */
    def predict(features: DataFrame): DataFrame =
      graft.classification.Classify.predict(model, featCols, features)
        .select(col("visit_id"), col("name"), col("pred"))
  }

  /** Fit a forest on a labelled feature matrix (J11 output). The reference
    * trains offline (classify.py) and ships the model into the mutation
    * pipeline; this is the engine-side equivalent. */
  def train(labelled: DataFrame, numTrees: Int = 20,
            seed: Long = 42L): Predictor = {
    val featCols = labelled.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] &&
        !Seq("visit_id", "label").contains(f.name) => f.name
    }
    val assembled = new VectorAssembler()
      .setInputCols(featCols).setOutputCol("fv").setHandleInvalid("keep")
      .transform(labelled.na.fill(0))
    val model = new RandomForestClassifier()
      .setNumTrees(numTrees).setLabelCol("label").setFeaturesCol("fv")
      .setSeed(seed).fit(assembled)
    Predictor(model, featCols)
  }

  final case class CandidateScore(tag: String, desired: Long,
                                  undesired: Long) {
    def diff: Long = desired - undesired
  }
  final case class IterationResult(iteration: Int,
                                   evaluated: Seq[CandidateScore],
                                   chosen: String, diff: Long)
  final case class Result(trajectory: Seq[IterationResult],
                          nodes: DataFrame, edges: DataFrame,
                          adversary: Seq[String])

  /** One adversary node (driver-side bookkeeping record). */
  final case class AdvNode(visitId: Long, name: String, tpe: String,
                           tlu: String)

  private def h64(s: String): Long = {
    // deterministic stand-in for the reference's random.randint choices
    var h = 1125899906842597L
    s.foreach(c => h = 31 * h + c)
    math.abs(h)
  }

  /** Default adversary (pipeline step 2, greedy_mutation.py:241-266 +
    * get_tp_nodes): nodes of the third-party domain with the most
    * predicted-positive nodes; deterministic name tie-break. */
  def adversaryNodes(nodes: DataFrame,
                     predictions: DataFrame): Seq[AdvNode] = {
    val tp = nodes.join(predictions.where(col("pred") === 1.0)
        .select("visit_id", "name"), Seq("visit_id", "name"))
      .where(col("party") === "third" ||
        (col("domain").isNotNull && col("top_level_domain").isNotNull &&
          col("domain") =!= col("top_level_domain")))
    val byDomain = tp.groupBy("domain").count()
      .orderBy(col("count").desc, col("domain").asc).limit(1)
    tp.join(byDomain.select("domain"), Seq("domain"))
      .select("visit_id", "name", "type", "top_level_url")
      .collect().toSeq
      .map(r => AdvNode(r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))
      .sortBy(_.name)
  }

  private val nodeCols = Seq("visit_id", "name", "top_level_url", "type",
    "attr", "domain", "top_level_domain", "party", "graph_attr")

  /** node_addition (mutate_styles.py:16-94 + create_child): a fake
    * Script/Request child under an adversary parent. */
  private def addNodeCandidate(spark: org.apache.spark.sql.SparkSession,
      nodes: DataFrame, edges: DataFrame, parent: AdvNode, tag: String)
      : (DataFrame, DataFrame, String, String) = {
    import spark.implicits._
    val vid = parent.visitId
    val tlu = parent.tlu
    val hh = h64(tag + parent.name)
    val childType = if (hh % 2 == 0) "Script" else "Request"
    val ext = if (childType == "Script") "js" else "req"
    val name = s"http://f${hh % 100000}.example/p${hh % 997}_fake.$ext"
    val cpt = if (childType == "Script") 2L else 3 + hh % 20
    val nodeAttr = s"""{"content_policy_type": $cpt, "top_level_url": "$tlu"}"""
    val newNode = Seq((vid, name, tlu, childType, nodeAttr,
        s"f${hh % 100000}.example", graft.norm.Etld1.ofUrl(tlu), "N/A", "Node"))
      .toDF(nodeCols: _*)
    val ctype = if (childType == "Script") "script" else "stylesheet"
    val newEdge = Seq((vid, parent.name, name, tlu,
        s"""{"ctype": "$ctype", "clength": ${hh % 1000}}""",
        """[["Fake-Header","fake_request"]]""",
        """[["Fake-Header","fake_response"]]""", "200",
        "2023-01-01T00:00:59", "N/A"))
      .toDF("visit_id", "src", "dst", "top_level_url", "attr", "reqattr",
        "respattr", "response_status", "time_stamp", "action")
    (nodes.unionByName(newNode, allowMissingColumns = true),
      Mutation.addEdges(edges, newEdge), name, childType)
  }

  /** storage_removal candidates (mutate_styles.py:96-106): `set`/`set_js`
    * edges from adversary sources into Storage nodes. */
  private def storageEdgeKeys(nodes: DataFrame, edges: DataFrame,
                              adv: Seq[String]): Seq[(String, String)] = {
    val storageNames = nodes.where(col("type") === "Storage")
      .select("name").distinct()
    // bounded driver pull: |adv| × |storage keys an adversary set| — the
    // adversary set is a handful of nodes by reference semantics
    // (mutate_utils.py candidate enumeration), so this is O(candidates),
    // not O(graph); same bound class as g8's top-k collect
    edges.where(col("action").isin("set", "set_js") &&
        col("src").isin(adv: _*))
      .join(storageNames.withColumnRenamed("name", "dst"), Seq("dst"))
      .select("src", "dst").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sorted
  }

  /** Score a candidate's predictions against the baseline
    * (calculate_misclassifications_mutated, mutate_utils.py:466-507):
    * desired = adversary True→False; undesired = others False→True plus
    * adversary False→True. `renames` maps mutated names back to originals
    * before the inner merge, as the reference's mapping_dict does. */
  def score(base: DataFrame, candidate: DataFrame, adv: Seq[String],
            renames: Map[String, String], tag: String): CandidateScore = {
    val backMapped =
      if (renames.isEmpty) candidate
      else {
        val m = renames.foldLeft(col("name")) { case (c, (nu, old)) =>
          when(col("name") === nu, lit(old)).otherwise(c)
        }
        candidate.withColumn("name", m)
      }
    // joined rows carry ORIGINAL names (backMapped) — adversary membership
    // must be tested against original names too, or a previously-chosen
    // obfuscation makes its node invisible to desired-flip counting
    val advOrig = adv.map(a => renames.getOrElse(a, a)).distinct
    val joined = base.withColumnRenamed("pred", "pred_base")
      .join(backMapped.withColumnRenamed("pred", "pred_new"),
        Seq("visit_id", "name"))
      .withColumn("is_adv", col("name").isin(advOrig: _*))
    val agg = joined.agg(
      sum(when(col("is_adv") && col("pred_base") === 1.0 &&
        col("pred_new") === 0.0, 1L).otherwise(0L)),
      sum(when(!col("is_adv") && col("pred_base") === 0.0 &&
        col("pred_new") === 1.0, 1L).otherwise(0L)),
      sum(when(col("is_adv") && col("pred_base") === 0.0 &&
        col("pred_new") === 1.0, 1L).otherwise(0L))).collect()(0)
    def g(i: Int) = if (agg.isNullAt(i)) 0L else agg.getLong(i)
    CandidateScore(tag, g(0), g(1) + g(2))
  }

  /** The greedy loop (greedy_mutation.py:302-314). Baseline predictions are
    * recomputed once up front; each iteration evaluates every enabled
    * mutation style and keeps the argmax-diff graph. */
  def run(nodes0: DataFrame, edges0: DataFrame, predictor: Predictor,
          iterations: Int, parentLimit: Int = 1,
          styles: Set[String] = Set("node_addition", "storage_removal",
            "url_obfuscation"),
          content: Option[DataFrame] = None,
          featureFn: (DataFrame, DataFrame, Option[DataFrame]) => DataFrame =
            FeatureExtraction.features): Result = {
    val spark = nodes0.sparkSession
    import spark.implicits._
    def pids = spark.sparkContext.getPersistentRDDs
    def releaseExcept(keep: Set[Int]): Unit =
      pids.filter(kv => !keep(kv._1)).values
        .foreach(_.unpersist(blocking = false))

    var nodes = nodes0.localCheckpoint(true)
    var edges = edges0.localCheckpoint(true)
    val basePred = predictor
      .predict(featureFn(nodes, edges, content))
      .localCheckpoint(true)
    basePred.count()
    // blocks pinned for the whole run (baseline + current generation);
    // everything else (per-candidate feature-IR checkpoints) is scratch
    val baseIds: Set[Int] = pids.keySet.toSet
    var curIds: Set[Int] = Set.empty
    var advRows = adversaryNodes(nodes, basePred)
    var adv = advRows.map(_.name)
    var renames = Map.empty[String, String] // new name -> original name
    val trajectory = Seq.newBuilder[IterationResult]

    var ct = 1
    var stop = adv.isEmpty
    while (ct <= iterations && !stop) {
      val parents = advRows
        .filter(_.tpe != "Storage")
        .sortBy(r => h64(s"$ct:${r.name}"))
        .take(parentLimit)

      // ---- candidates --------------------------------------------------
      // the Option carries (child name, child type, parent) so a chosen
      // addition is recorded in the PARENT's visit/top-level-url — a later
      // iteration sampling the child as a parent must mutate that visit
      var cands = Seq.empty[(String, DataFrame, DataFrame,
        Map[String, String], Option[(String, String, AdvNode)])]
      if (styles("node_addition")) cands ++= parents.zipWithIndex.map {
        case (p, i) =>
          val tag = s"${ct}_${i}_add_node"
          val (n2, e2, child, ctype) =
            addNodeCandidate(spark, nodes, edges, p, tag)
          (tag, n2, e2, Map.empty[String, String], Some((child, ctype, p)))
      }
      if (styles("storage_removal"))
        cands ++= storageEdgeKeys(nodes, edges, adv).take(parentLimit)
          .zipWithIndex.map { case ((src, dst), i) =>
            val tag = s"${ct}_${i}_remove_storage"
            (tag, nodes, Mutation.removeEdges(edges,
              col("src") === src && col("dst") === dst &&
                col("action").isin("set", "set_js")),
              Map.empty[String, String], None)
          }
      if (styles("url_obfuscation"))
        cands ++= parents.zipWithIndex.map { case (p, i) =>
          val tag = s"${ct}_${i}_obfuscate"
          val old = p.name
          val nu = s"http://ob${h64(tag + old) % 100000}.example/o"
          val mapping = Seq((old, nu)).toDF("old_url", "new_url")
          val (n2, e2) = Mutation.obfuscateUrls(nodes, edges, mapping)
          (tag, n2, e2, Map(nu -> renames.getOrElse(old, old)), None)
        }

      if (cands.isEmpty) { stop = true }
      else {
        val scored = cands.map { case (tag, n2, e2, rn, _) =>
          val pred = predictor
            .predict(featureFn(n2, e2, content))
          val s = score(basePred, pred, adv, renames ++ rn, tag)
          releaseExcept(baseIds ++ curIds) // drop candidate feature scratch
          s
        }
        val best = scored.maxBy(s => (s.diff, s.tag))
        val (_, bn, be, brn, child) =
          cands(scored.indexWhere(_.tag == best.tag))
        val before = pids.keySet.toSet
        nodes = bn.localCheckpoint(true)
        edges = be.localCheckpoint(true)
        val newIds = pids.keySet.toSet -- before
        releaseExcept(baseIds ++ newIds) // retire the previous generation
        curIds = newIds
        renames ++= brn
        // chosen obfuscation renames the adversary node; chosen addition
        // extends the adversary pool (greedy_mutation.py:311-313)
        brn.foreach { case (nu, old) =>
          adv = adv.map(a => if (a == old || renames.get(a).contains(old)) nu
            else a)
          advRows = advRows.map(r =>
            if (r.name == old || renames.get(r.name).contains(old))
              r.copy(name = nu) else r)
        }
        child.foreach { case (c, ctype, parent) =>
          adv :+= c
          advRows :+= AdvNode(parent.visitId, c, ctype, parent.tlu)
        }
        trajectory += IterationResult(ct, scored, best.tag, best.diff)
      }
      ct += 1
    }
    Result(trajectory.result(), nodes, edges, adv)
  }
}
