package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.classification.Classify

/** Classification stage: visit-split cross-validation learns a separable
  * synthetic signal; folds never mix a visit's rows; importances rank the
  * signal feature first. */
class ClassifySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 40 visits × 20 nodes; label = f1 > 0 with f1 cleanly separated,
  // f2/f3 pure noise — a forest must reach ~perfect held-out accuracy
  private lazy val labelled = {
    import graft.core.Hashing.{bounded, h}
    val rows = for (v <- 0L until 40L; i <- 0 until 20) yield {
      val isAd = bounded(h(1L, v, i, 0), 2) == 1
      val f1 = (if (isAd) 5.0 else -5.0) +
        bounded(h(2L, v, i, 1), 100) / 50.0
      val f2 = bounded(h(3L, v, i, 2), 1000) / 100.0
      val f3 = bounded(h(4L, v, i, 3), 7).toDouble
      (v, s"http://s$v.example/n$i", f1, f2, f3, isAd)
    }
    rows.toDF("visit_id", "name", "f1", "f2", "f3", "label")
  }

  test("visit-split CV reaches high accuracy on a separable signal") {
    val joined = Classify.join(
      labelled.drop("label"),
      labelled.select(col("visit_id"), col("name"), col("label")))
    val (folds, model, featCols) = Classify.crossValidate(joined, k = 5,
      numTrees = 20)
    assert(folds.size === 5)
    folds.foreach { f =>
      assert(f.accuracy > 0.95, s"fold ${f.fold} acc ${f.accuracy}")
      assert(f.precision > 0.9 && f.recall > 0.9, s"fold ${f.fold}")
    }
    val imp = Classify.importances(model, featCols)
    assert(imp.head._1 === "f1", s"importances: $imp")
  }

  test("model persistence round trip: saved model predicts identically (S8)") {
    val joined = Classify.join(
      labelled.drop("label"),
      labelled.select(col("visit_id"), col("name"), col("label")))
    val (_, model, featCols) = Classify.crossValidate(joined, k = 5,
      numTrees = 20)
    val dir = java.nio.file.Files.createTempDirectory("graft_model").toString
    Classify.saveModel(model, featCols, dir)
    val (model2, featCols2) = Classify.loadModel(dir)
    assert(featCols2.toSeq === featCols.toSeq)
    val before = Classify.predict(model, featCols, labelled.drop("label"))
    val after = Classify.predict(model2, featCols2, labelled.drop("label"))
    assert(before.count() === 800)
    assert(before.exceptAll(after).count() === 0 &&
      after.exceptAll(before).count() === 0)
    // the reloaded forest reproduces the separable signal
    val acc = after.join(labelled.select(col("visit_id"), col("name"),
        col("label").cast("double").as("y")), Seq("visit_id", "name"))
      .where(col("pred") === col("y")).count()
    assert(acc >= 780, s"reloaded model accuracy dropped: $acc/800")
  }

  test("folds partition rows by visit (no visit straddles train/test)") {
    // fold id is visit_id % k by construction — verify the property the
    // reference enforces by sampling visit ids per fold
    val k = 5
    val byVisit = labelled.select("visit_id").distinct()
      .withColumn("fold", pmod(col("visit_id"), lit(k)))
      .groupBy("visit_id").agg(countDistinct("fold").as("nf"))
      .where(col("nf") > 1).count()
    assert(byVisit === 0L)
  }
}
