package graft.classification

import org.apache.spark.ml.classification.RandomForestClassificationModel
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.tree.{CategoricalSplit, ContinuousSplit, InternalNode, LeafNode, Node}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-prediction feature contributions for a trained random forest — the
  * engine counterpart of the reference's treeinterpreter logging
  * (/root/reference/code/classification/classify.py:203-235,
  * `ti.predict(clf, X)`), the one reference behavior previously left as a
  * documented non-goal.
  *
  * Semantics (treeinterpreter): within one tree, every node carries the
  * class distribution of the training rows that reached it; walking a
  * sample root→leaf,
  *
  *   leaf_probs = root_probs + Σ_path (child_probs − parent_probs)
  *
  * and each path term is attributed to the PARENT's split feature. The
  * forest averages bias (root probs) and per-feature contributions across
  * trees. Spark ML's own `probability` column is exactly the across-tree
  * average of normalized leaf class distributions, so the decomposition is
  * exact here too:  probability(c) = bias(c) + Σ_f contribution(f, c)  —
  * the spec asserts this to 1e-12.
  *
  * Execution shape: the forest is flattened ONCE on the driver into
  * primitive arrays (node class distributions are read from the model's
  * `impurityStats` via reflection — `private[ml]` in the Scala API but
  * public in bytecode; extraction-time only, never per row) and broadcast;
  * scoring walks the compact arrays per row inside a vector→struct UDF —
  * the same UDF-shaped extension point spark.ml itself uses for model
  * scoring, not SQL-expressible (documented UDF-site justification,
  * PLANS.md class).
  */
object TreeInterpret {

  /** One flattened tree: node i is a leaf iff feat(i) < 0; otherwise the
    * split is continuous (catsLeft(i) == null → go left iff
    * x(feat) <= thr(i)) or categorical (go left iff catsLeft(i) contains
    * x(feat)). probs(i) = normalized training class distribution. */
  final case class CTree(
      feat: Array[Int], thr: Array[Double], catsLeft: Array[Array[Double]],
      left: Array[Int], right: Array[Int], probs: Array[Array[Double]])
      extends Serializable

  final case class CForest(trees: Array[CTree], numClasses: Int,
                           numFeatures: Int) extends Serializable

  // ---- driver-side extraction ---------------------------------------------

  /** Normalized class distribution of a node. `impurityStats` is
    * private[ml] in source but a public method in bytecode; one reflective
    * call per NODE at extraction time (never in the row path). */
  private def nodeProbs(n: Node, numClasses: Int): Array[Double] = {
    val calc = n.getClass.getMethods.find(_.getName == "impurityStats").get
      .invoke(n)
    val stats = calc.getClass.getMethods.find(_.getName == "stats").get
      .invoke(calc).asInstanceOf[Array[Double]]
    val total = stats.sum
    if (total == 0.0) new Array[Double](numClasses)
    else stats.map(_ / total)
  }

  private def flatten(root: Node, numClasses: Int): CTree = {
    val feat = scala.collection.mutable.ArrayBuffer[Int]()
    val thr = scala.collection.mutable.ArrayBuffer[Double]()
    val cats = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    val left = scala.collection.mutable.ArrayBuffer[Int]()
    val right = scala.collection.mutable.ArrayBuffer[Int]()
    val probs = scala.collection.mutable.ArrayBuffer[Array[Double]]()

    def add(n: Node): Int = {
      val i = feat.length
      feat += 0; thr += 0.0; cats += null; left += -1; right += -1
      probs += nodeProbs(n, numClasses)
      n match {
        case in: InternalNode =>
          in.split match {
            case c: ContinuousSplit =>
              feat(i) = c.featureIndex; thr(i) = c.threshold
            case c: CategoricalSplit =>
              feat(i) = c.featureIndex; cats(i) = c.leftCategories.sorted
            case other =>
              throw new IllegalArgumentException(
                s"unsupported split type ${other.getClass.getName}")
          }
          left(i) = add(in.leftChild)
          right(i) = add(in.rightChild)
        case _: LeafNode => feat(i) = -1
        case other => throw new IllegalArgumentException(
          s"unsupported node type ${other.getClass.getName}")
      }
      i
    }
    add(root)
    CTree(feat.toArray, thr.toArray, cats.toArray, left.toArray,
      right.toArray, probs.toArray)
  }

  /** Flatten a trained forest into the broadcastable compact form. */
  def compile(model: RandomForestClassificationModel): CForest =
    CForest(model.trees.map(t => flatten(t.rootNode, model.numClasses)),
      model.numClasses, model.numFeatures)

  // ---- row-path scoring (no Spark types beyond Vector) ---------------------

  /** (probs, bias, per-feature contributions) of one sample for class
    * `classIdx`; probs covers ALL classes (= spark.ml `probability`). */
  def interpretVector(f: CForest, fv: Vector, classIdx: Int)
      : (Array[Double], Double, Array[Double]) = {
    val probsAcc = new Array[Double](f.numClasses)
    val contrib = new Array[Double](f.numFeatures)
    var bias = 0.0
    val nTrees = f.trees.length
    var t = 0
    while (t < nTrees) {
      val tree = f.trees(t)
      bias += tree.probs(0)(classIdx)
      var i = 0
      while (tree.feat(i) >= 0) {
        val fi = tree.feat(i)
        val x = fv(fi)
        val next =
          if (tree.catsLeft(i) == null) {
            if (x <= tree.thr(i)) tree.left(i) else tree.right(i)
          } else {
            if (java.util.Arrays.binarySearch(tree.catsLeft(i), x) >= 0)
              tree.left(i)
            else tree.right(i)
          }
        contrib(fi) += tree.probs(next)(classIdx) - tree.probs(i)(classIdx)
        i = next
      }
      var c = 0
      while (c < f.numClasses) { probsAcc(c) += tree.probs(i)(c); c += 1 }
      t += 1
    }
    var c = 0
    while (c < f.numClasses) { probsAcc(c) /= nTrees; c += 1 }
    var j = 0
    while (j < f.numFeatures) { contrib(j) /= nTrees; j += 1 }
    (probsAcc, bias / nTrees, contrib)
  }

  // public on purpose: Scala `private` compiles the class package-private,
  // so Janino's generated encoder code (another package) cannot resolve the
  // accessors and the UDF-output serializer silently falls back to
  // interpreter mode ("Expr codegen error" WARN + a slower per-row path)
  final case class InterpOut(prob: Array[Double], bias: Double,
                             contrib: Array[Double])

  /** Interpret a feature matrix: returns
    * `(visit_id, name, pred, prob, bias, contributions)` where `prob` is
    * the full class-probability array (identical to spark.ml's
    * `probability`), `bias` the forest-average root probability of class
    * `classIdx`, and `contributions` a feature→contribution map for class
    * `classIdx` with `prob(classIdx) = bias + Σ contributions` exactly.
    * The reference logs class 0 (classify.py:229 `contributions[i,:,0]`),
    * hence the default. */
  def interpret(model: RandomForestClassificationModel,
                featCols: Array[String], features: DataFrame,
                classIdx: Int = 0): DataFrame = {
    require(classIdx >= 0 && classIdx < model.numClasses, "bad classIdx")
    val spark = features.sparkSession
    val assembled = new VectorAssembler()
      .setInputCols(featCols).setOutputCol("fv").setHandleInvalid("keep")
      .transform(features.na.fill(0))
    val bc = spark.sparkContext.broadcast(compile(model))
    val itp = udf((v: Vector) => {
      val (p, b, c) = interpretVector(bc.value, v, classIdx)
      InterpOut(p, b, c)
    })
    assembled
      .withColumn("itp", itp(col("fv")))
      .select(col("visit_id"), col("name"),
        // argmax with lowest-index tie-break — spark.ml's own rule
        expr("array_position(itp.prob, array_max(itp.prob)) - 1")
          .cast("double").as("pred"),
        col("itp.prob").as("prob"), col("itp.bias").as("bias"),
        map_from_arrays(
          array(featCols.map(lit(_)): _*), col("itp.contrib"))
          .as("contributions"))
  }
}
