package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.classification.Classify
import graft.features.{Adblock, FeatureExtraction}
import graft.sources.GraphCsv
import graft.webgraph._

/** The reference pipeline's E1→E3 lifecycle (/root/reference/code/run.py →
  * classify.py, SURVEY.md §3) as ONE spark-submit entry point — what a user
  * of the reference would run instead of `python code/run.py`:
  *
  *   spark-submit --class graft.tools.WebGraphRun <jar> \
  *     [--crawl <dir>]        parquet tables http_requests / http_responses /
  *                            http_redirects / callstacks / javascript
  *                            (omitted → the deterministic FixtureCrawl)
  *     [--events <sfdir>]     alternative source: derive the OpenWPM tables
  *                            from an events.parquet testdata dir (the wg7
  *                            oracle derivation) — the soak/benchmark path
  *     [--content <parquet>]  (content_hash, body) script store (S3)
  *     [--filterlist <file>]  Adblock-Plus rules, one per line (labelling)
  *     --out <dir>            [--partitions N] [--csv] [--classify]
  *     [--interpret]          per-prediction bias + feature contributions
  *                            (treeinterpreter parity) → interpretation/
  *                            + interpretation_0.json
  *     [--model-out <dir>]    persist trained model + feature manifest (S8)
  *     [--model <dir>]        apply a saved model to this crawl's features
  *                            (classify_with_model.py) → predictions/
  *
  * Stages written under --out:
  *   graph_nodes/ graph_edges/   the unified property graph (parquet IR —
  *                               the reference's graph.csv handoff);
  *                               `--csv` additionally exports the 23-column
  *                               graph.csv interchange file (S4/S5)
  *   features/                   the full per-node feature matrix
  *   labels/                     filter-list labels (when --filterlist)
  *   metrics.json                fold accuracy/precision/recall
  *                               (when --classify, needs labels)
  *
  * The per-visit loop of the reference is just the visit_id grouping column
  * here — every stage is one distributed dataflow over all visits at once.
  */
object WebGraphRun {

  private def arg(args: Array[String], name: String): Option[String] = {
    val i = args.indexOf(s"--$name")
    if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
  }
  private def flag(args: Array[String], name: String): Boolean =
    args.contains(s"--$name")

  def main(args: Array[String]): Unit = {
    // machine-read JSON below is built with the f-interpolator, which
    // formats via the JVM default locale (comma decimals under de_DE etc.)
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val out = arg(args, "out").getOrElse(sys.error("--out <dir> is required"))
    val partitions = arg(args, "partitions").map(_.toInt).getOrElse(32)

    val builder = SparkSession.builder()
      .appName("graft-webgraph")
      .config("spark.sql.shuffle.partitions", partitions)
      .config("spark.sql.session.timeZone", "UTC")
      // subset co-partitioning: a child hash-partitioned on a SUBSET of
      // the join keys co-partitions the join (the wg4 redirect assembly
      // pre-partitions its four inputs on (visit_id, old_request_id) and
      // every URL-suffixed join + window reuses that one exchange —
      // PLANS.md wg4 row); engine repartitions are all deliberate
      // high-cardinality keys, so the skew guard the default protects
      // against does not apply
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
    val spark = (if (sys.props.contains("spark.master")) builder
      else builder.master(arg(args, "master").getOrElse("local[*]")))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- sources (S1/S2 shape: explicit-schema parquet scans) ----------
    val (requests, responses, redirects, callstacks, js) =
      (arg(args, "crawl"), arg(args, "events")) match {
        case (Some(dir), _) => (
          spark.read.parquet(s"$dir/http_requests").as[HttpRequest],
          spark.read.parquet(s"$dir/http_responses").as[HttpResponse],
          spark.read.parquet(s"$dir/http_redirects").as[HttpRedirect],
          spark.read.parquet(s"$dir/callstacks").as[CallStack],
          spark.read.parquet(s"$dir/javascript").as[JsCall])
        case (None, Some(sfDir)) =>
          val (req, resp, jsc) = graft.QueriesWebGraph.wg7Tables(spark, sfDir)
          (req, resp, spark.emptyDataset[HttpRedirect],
            spark.emptyDataset[CallStack], jsc)
        case _ => (
          FixtureCrawl.requests(spark), FixtureCrawl.responses(spark),
          FixtureCrawl.redirects(spark), FixtureCrawl.callstacks(spark),
          FixtureCrawl.jsCalls(spark))
      }
    val content: Option[DataFrame] = arg(args, "content")
      .map(spark.read.parquet(_))
      .orElse(if (arg(args, "crawl").isEmpty)
        Some(FixtureCrawl.contentBodies(spark).toDF()) else None)

    // ---- E1: construction → durable graph IR ---------------------------
    val (nodes, edges) = GraphAssembly.unifiedGraph(
      requests, responses, redirects, callstacks, js)
    nodes.write.mode(SaveMode.Overwrite).parquet(s"$out/graph_nodes")
    edges.write.mode(SaveMode.Overwrite).parquet(s"$out/graph_edges")
    val n = spark.read.parquet(s"$out/graph_nodes")
    val e = spark.read.parquet(s"$out/graph_edges")

    if (flag(args, "csv"))
      GraphCsv.write(GraphCsv.unified(n, e), s"$out/graph_csv")

    // ---- E1 tail: feature matrix ---------------------------------------
    val feats = FeatureExtraction.features(n, e, content)
    feats.write.mode(SaveMode.Overwrite).parquet(s"$out/features")

    // ---- labelling (adblock-rule matching when a list is supplied) -----
    val labels = arg(args, "filterlist").map { path =>
      val lines = scala.io.Source.fromFile(path, "UTF-8").getLines().toSeq
      val rules = Adblock.parseList(lines)
      val l = Adblock.labelNodes(n, Seq(rules))
      l.write.mode(SaveMode.Overwrite).parquet(s"$out/labels")
      spark.read.parquet(s"$out/labels")
    }

    // ---- E3: classification --------------------------------------------
    if (flag(args, "classify")) labels match {
      case Some(l) =>
        val joined = Classify.join(
          spark.read.parquet(s"$out/features"),
          l.where(col("label").isNotNull)) // "Error" rows drop, as reference
        val (folds, model, featCols) = Classify.crossValidate(joined,
          k = arg(args, "folds").map(_.toInt).getOrElse(10))
        // S8: persist the trained forest + feature manifest (--model-out)
        arg(args, "model-out").foreach { dir =>
          if (model != null) Classify.saveModel(model, featCols, dir)
        }
        // every fold needs non-empty train AND test visits — a crawl with
        // too few visits yields no usable folds (and no model)
        val imp =
          if (model == null) "[]"
          else Classify.importances(model, featCols).take(10)
            .map { case (f, w) => f"""{"feature":"$f","weight":$w%.6f}""" }
            .mkString("[", ",", "]")
        val foldJson = folds.map(f =>
          f"""{"fold":${f.fold},"accuracy":${f.accuracy}%.4f,""" +
            f""""precision":${f.precision}%.4f,"recall":${f.recall}%.4f,""" +
            f""""rows":${f.testRows}}""").mkString("[", ",", "]")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$out/metrics.json"),
          s"""{"folds":$foldJson,"top_importances":$imp}""")
        if (folds.isEmpty) System.err.println(
          "classification: no usable folds (need >= 2 visits with labels)")
        // tree interpretation (classify.py:203-235 log_interpretation):
        // per-prediction bias + per-feature contributions. The reference
        // interprets each fold's test slice with that fold's model; here the
        // final fold's model interprets the full labelled matrix (one
        // model, one file — the per-fold variant is the same call in a
        // loop). JSON mirrors the reference: key "<name>_<vid>", class-0
        // contributions zipped with feature names, rounded to 2dp.
        if (flag(args, "interpret") && model != null) {
          val itp = graft.classification.TreeInterpret.interpret(
            model, featCols, joined.drop("label"), classIdx = 0)
          itp.write.mode(SaveMode.Overwrite).parquet(s"$out/interpretation")
          // streamed, not collect()'d: each row carries a |featCols|-entry
          // contribution map, so a large crawl's full interpretation table
          // in one driver array (plus one giant concatenated string) OOMs
          // exactly where the rest of the pipeline streams. toLocalIterator
          // holds one partition at a time; the JSON is appended row-by-row.
          val rows = spark.read.parquet(s"$out/interpretation")
            .select(col("name"), col("visit_id"), col("contributions"))
            .toLocalIterator()
          val w = java.nio.file.Files.newBufferedWriter(
            java.nio.file.Paths.get(s"$out/interpretation_0.json"))
          try {
            w.write("{")
            var first = true
            while (rows.hasNext) {
              val r = rows.next()
              val name = r.getString(0)
              val vid = r.getLong(1)
              val contrib = r.getMap[String, Double](2)
              val pairs = featCols.map { f =>
                f"""[${contrib.getOrElse(f, 0.0)}%.2f, ${graft.core.Json.str(f)}]"""
              }.mkString("[", ", ", "]")
              if (!first) w.write(",\n")
              first = false
              w.write(graft.core.Json.str(s"${name}_$vid") + ": {" +
                s""""name": ${graft.core.Json.str(name)}, "vid": "$vid", """ +
                s""""contributions": $pairs}""")
            }
            w.write("}")
          } finally w.close()
        }
      case None =>
        System.err.println("--classify requires --filterlist (labels)")
    }

    // ---- S8 predict path (classify_with_model.py): a previously saved
    // model applied to this crawl's freshly-extracted features ------------
    arg(args, "model").foreach { dir =>
      val (model, featCols) = Classify.loadModel(dir)
      Classify.predict(model, featCols,
          spark.read.parquet(s"$out/features"))
        .write.mode(SaveMode.Overwrite).parquet(s"$out/predictions")
    }

    println(s"webgraph pipeline complete -> $out " +
      s"(nodes=${n.count()}, edges=${e.count()}, features=${feats.columns.length} cols)")
    spark.stop()
  }
}
