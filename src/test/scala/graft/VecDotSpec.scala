package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native `vec_dot` (graft.ext.VecExpressions) to the higher-order
  * `aggregate(zip_with(a,b,_*_),0.0,_+_)` formulation it replaced:
  * bit-identical sequential double accumulation, zip_with-pad null
  * semantics on length mismatch, null-element poisoning, empty → 0.0. */
class VecDotSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  test("vec_dot ≡ aggregate∘zip_with bit-for-bit on generated float vectors") {
    val vecGen = for {
      n <- Gen.choose(0, 48)
      xs <- Gen.listOfN(n, Gen.choose(-10f, 10f))
    } yield xs
    val pairGen = for {
      a <- vecGen
      sameLen <- Gen.frequency(4 -> true, 1 -> false)
      b <- if (sameLen) Gen.listOfN(a.length, Gen.choose(-10f, 10f)) else vecGen
    } yield (a, b)
    val rows = (1 to 400).map(k =>
      pairGen.pureApply(Gen.Parameters.default, Seed(k.toLong)))
    val df = rows.toDF("a", "b")
    val bad = df.select(
        call_function("vec_dot", col("a"), col("b")).as("native"),
        hofDot(col("a"), col("b")).as("hof"))
      // bit-identical, not approximate: same fold order, same widening
      .where(!(col("native") <=> col("hof"))).count()
    assert(bad == 0)
  }

  test("null-element poisoning and double arrays match the HOF path") {
    val df = Seq(
      (Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 1.0, 1.0)),
      (Seq[java.lang.Double](1.5, 2.0), Seq[java.lang.Double](2.0, -0.5)),
      (Seq.empty[java.lang.Double], Seq.empty[java.lang.Double])
    ).toDF("a", "b")
    val got = df.select(
      call_function("vec_dot", col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
    assert(got(0).isNullAt(0))       // null element → null
    assert(got(1).getDouble(0) == 2.0)
    assert(got(2).getDouble(0) == 0.0) // empty → 0.0
  }

  test("two sibling vec_dot calls over NON-NULLABLE arrays codegen in one " +
    "scope (fresh locals — fixed names collide when nullSafeCodeGen " +
    "inlines unbraced)") {
    // array() of non-nullable children is non-nullable, so nullSafeCodeGen
    // emits the result blocks UNBRACED in one generated method; a fixed
    // Java local name would be declared twice → Janino error → silent
    // interpreted fallback. fallback=false turns that into a hard failure.
    val df = spark.range(4)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"),
        array(lit(1.0), col("id").cast("double")).as("b"))
    assert(!df.schema("a").nullable && !df.schema("b").nullable)
    val saved = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val got = df.select(
          call_function("vec_dot", col("a"), col("b")).as("d1"),
          call_function("vec_dot", col("b"), col("a")).as("d2"))
        .collect().map(r => (r.getDouble(0), r.getDouble(1)))
      assert(got.map(_._1).sorted.toSeq == Seq(0.0, 3.0, 6.0, 9.0))
      assert(got.forall(p => p._1 == p._2)) // dot is symmetric
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None    => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("vec_dot plans inside whole-stage codegen") {
    val df = spark.range(4)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"),
        array(lit(1.0), col("id").cast("double")).as("b"))
      .select(call_function("vec_dot", col("a"), col("b")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    assert(plan.contains("*("))
    assert(df.collect().map(_.getDouble(0)).sorted.toSeq ==
      Seq(0.0, 3.0, 6.0, 9.0))
  }
}
