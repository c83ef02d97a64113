package graft.classification

import org.apache.spark.ml.classification.{RandomForestClassificationModel, RandomForestClassifier}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ad/tracker classification (reference:
  * /root/reference/code/classification/classify.py — SURVEY.md §3 E3):
  * features ⋈ labels (J11), k-fold cross-validation split BY VISIT
  * (J12 — never split one site's nodes across train/test), random forest,
  * accuracy/precision/recall + feature importances.
  *
  * spark.ml end-to-end: VectorAssembler → RandomForestClassifier; the fold
  * split is a semi/anti join against a hash-partitioned visit list (the
  * reference samples visit ids per fold, classify.py:341-357 — we use
  * deterministic visit_id % k so folds are stable across runs).
  */
object Classify {

  final case class FoldMetrics(fold: Int, accuracy: Double, precision: Double,
                               recall: Double, testRows: Long)

  /** J11: feature matrix ⋈ label table on (visit_id, name). */
  def join(features: DataFrame, labels: DataFrame): DataFrame =
    features.join(labels.select(col("visit_id"), col("name"),
      col("label").cast("double").as("label")), Seq("visit_id", "name"))

  private def numericCols(df: DataFrame): Array[String] =
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
        && !Seq("visit_id", "label").contains(f.name) => f.name
    }

  /** k-fold CV split by visit; returns per-fold metrics and the last
    * fold's trained model (for importances). */
  def crossValidate(labelled: DataFrame, k: Int = 10, numTrees: Int = 100,
                    seed: Long = 42L): (Seq[FoldMetrics], RandomForestClassificationModel, Array[String]) = {
    val featCols = numericCols(labelled)
    val assembled = new VectorAssembler()
      .setInputCols(featCols).setOutputCol("fv").setHandleInvalid("keep")
      .transform(labelled.na.fill(0))
      .withColumn("fold", pmod(col("visit_id"), lit(k)))
      .persist()
    assembled.count()

    var lastModel: RandomForestClassificationModel = null
    val folds = (0 until k).flatMap { f =>
      val train = assembled.where(col("fold") =!= f)
      val test = assembled.where(col("fold") === f)
      if (test.isEmpty || train.isEmpty) None
      else {
        val rf = new RandomForestClassifier()
          .setNumTrees(numTrees).setLabelCol("label").setFeaturesCol("fv")
          .setSeed(seed)
        val model = rf.fit(train)
        lastModel = model
        val pred = model.transform(test)
          .select(col("label"), col("prediction"))
        val agg = pred.agg(
          sum(when(col("label") === col("prediction"), 1L).otherwise(0L)),
          sum(when(col("prediction") === 1.0 && col("label") === 1.0, 1L).otherwise(0L)),
          sum(when(col("prediction") === 1.0, 1L).otherwise(0L)),
          sum(when(col("label") === 1.0, 1L).otherwise(0L)),
          count(lit(1))).collect()(0)
        val (correct, tp, predPos, actPos, n) =
          (agg.getLong(0), agg.getLong(1), agg.getLong(2), agg.getLong(3),
            agg.getLong(4))
        Some(FoldMetrics(f,
          accuracy = correct.toDouble / n,
          precision = if (predPos == 0) 0.0 else tp.toDouble / predPos,
          recall = if (actPos == 0) 0.0 else tp.toDouble / actPos,
          testRows = n))
      }
    }
    assembled.unpersist(false)
    (folds, lastModel, featCols)
  }

  /** Feature importances of a trained model, descending — the reference's
    * report_feature_importance (classify.py:295-296). */
  def importances(model: RandomForestClassificationModel,
                  featCols: Array[String]): Seq[(String, Double)] =
    featCols.zip(model.featureImportances.toArray).sortBy(-_._2).toSeq

  // ---- S8: model persistence (classify_with_model.py) ---------------------
  // The reference persists the trained forest with joblib and re-applies it
  // to freshly-extracted features; spark.ml's native writer is the engine
  // equivalent, plus the feature-column manifest (the part joblib pickles
  // implicitly) so predict-time assembly matches train-time assembly.

  /** Persist a trained model + its feature-column manifest. */
  def saveModel(model: RandomForestClassificationModel,
                featCols: Array[String], path: String): Unit = {
    model.write.overwrite().save(s"$path/model")
    val json = featCols.map(graft.core.Json.str).mkString("[", ",", "]")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/feature_columns.json"), json)
  }

  /** Load a persisted model + manifest. */
  def loadModel(path: String): (RandomForestClassificationModel, Array[String]) = {
    val model = RandomForestClassificationModel.load(s"$path/model")
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$path/feature_columns.json"))
    // single-pass JSON unescape, symmetric with the writer's Json.str
    // escaping (ordered chained .replace's mis-decode backslash-before-
    // quote sequences — the corruption class CookieParse.unescapeJson
    // exists to avoid)
    val cols = "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(json)
      .map(m => graft.webgraph.CookieParse.unescapeJson(m.group(1)))
      .toArray
    (model, cols)
  }

  /** Apply a (possibly reloaded) model to a feature matrix —
    * classify_with_model.py's predict path. Returns
    * (visit_id, name, pred, prob_pos). */
  def predict(model: RandomForestClassificationModel,
              featCols: Array[String], features: DataFrame): DataFrame = {
    val assembled = new VectorAssembler()
      .setInputCols(featCols).setOutputCol("fv").setHandleInvalid("keep")
      .transform(features.na.fill(0))
    val getP = udf((v: org.apache.spark.ml.linalg.Vector) => v(1))
    model.transform(assembled)
      .select(col("visit_id"), col("name"), col("prediction").as("pred"),
        getP(col("probability")).as("prob_pos"))
  }
}
