package graft

import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.classification.{Classify, TreeInterpret}

/** Tree interpretation (treeinterpreter semantics over the spark.ml
  * forest): exact additive decomposition probability = bias + Σ
  * contributions, agreement with spark.ml's own probability/prediction
  * columns, signal attribution, and zero contribution for unused features. */
class TreeInterpretSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // same separable fixture family as ClassifySpec: f1 carries the signal,
  // f2/f3 noise; f4 is CONSTANT so no split can ever use it
  private lazy val labelled = {
    import graft.core.Hashing.{bounded, h}
    val rows = for (v <- 0L until 20L; i <- 0 until 20) yield {
      val isAd = bounded(h(1L, v, i, 0), 2) == 1
      val f1 = (if (isAd) 5.0 else -5.0) + bounded(h(2L, v, i, 1), 100) / 50.0
      val f2 = bounded(h(3L, v, i, 2), 1000) / 100.0
      val f3 = bounded(h(4L, v, i, 3), 7).toDouble
      (v, s"http://s$v.example/n$i", f1, f2, f3, 0.0, if (isAd) 1.0 else 0.0)
    }
    rows.toDF("visit_id", "name", "f1", "f2", "f3", "f4", "label")
  }

  private lazy val featCols = Array("f1", "f2", "f3", "f4")

  private lazy val model = {
    val assembled = new VectorAssembler()
      .setInputCols(featCols).setOutputCol("fv").transform(labelled)
    new RandomForestClassifier()
      .setNumTrees(15).setLabelCol("label").setFeaturesCol("fv")
      .setSeed(7L).setBootstrap(false).setFeatureSubsetStrategy("all")
      .fit(assembled)
  }

  test("probability = bias + sum(contributions) exactly, and matches " +
    "spark.ml's probability column for both classes") {
    val forest = TreeInterpret.compile(model)
    assert(forest.trees.length === 15 && forest.numClasses === 2)

    val assembled = new VectorAssembler()
      .setInputCols(featCols).setOutputCol("fv").transform(labelled)
    val sparkSide = model.transform(assembled)
      .select(col("name"), col("probability"), col("prediction"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getAs[org.apache.spark.ml.linalg.Vector](1), r.getDouble(2)))
      .toMap

    for (classIdx <- Seq(0, 1)) {
      val rows = TreeInterpret.interpret(model, featCols,
        labelled.drop("label"), classIdx).collect()
      assert(rows.length === 400)
      rows.foreach { r =>
        val name = r.getString(1)
        val pred = r.getDouble(2)
        val prob = r.getSeq[Double](3)
        val bias = r.getDouble(4)
        val contrib = r.getMap[String, Double](5)
        val (mlProb, mlPred) = sparkSide(name)
        // additive decomposition is exact (same floating-point averages)
        assert(math.abs(prob(classIdx) - (bias + contrib.values.sum)) < 1e-9,
          s"$name class $classIdx decomposition")
        // agrees with spark.ml's scoring
        assert(math.abs(prob(0) - mlProb(0)) < 1e-12 &&
          math.abs(prob(1) - mlProb(1)) < 1e-12, s"$name prob parity")
        assert(pred === mlPred, s"$name pred parity")
        // a constant feature can never split: exactly zero contribution
        assert(contrib("f4") === 0.0)
      }
    }
  }

  test("the separable signal feature dominates contributions with the " +
    "right sign") {
    val rows = TreeInterpret.interpret(model, featCols,
      labelled.drop("label"), classIdx = 1)
      .join(labelled.select(col("name"), col("label")), "name")
      .collect()
    rows.foreach { r =>
      val contrib = r.getMap[String, Double](r.fieldIndex("contributions"))
      val label = r.getDouble(r.fieldIndex("label"))
      val f1c = contrib("f1")
      val restMax = Seq("f2", "f3", "f4").map(k => math.abs(contrib(k))).max
      assert(math.abs(f1c) >= restMax,
        s"f1 must dominate: $contrib")
      // class-1 contribution of the signal feature follows the label
      if (label === 1.0) assert(f1c > 0.0) else assert(f1c < 0.0)
    }
  }

  test("bias is the training base rate (root class distribution averaged " +
    "over trees; no bootstrap → exact)") {
    val forest = TreeInterpret.compile(model)
    val base = labelled.agg(avg(col("label"))).collect()(0).getDouble(0)
    val someRow = TreeInterpret.interpret(model, featCols,
      labelled.drop("label").limit(1), classIdx = 1).collect()(0)
    assert(math.abs(someRow.getDouble(4) - base) < 1e-12)
    assert(forest.trees.forall(t => math.abs(t.probs(0)(1) - base) < 1e-12))
  }
}
