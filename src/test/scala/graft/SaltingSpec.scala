package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.Salting

/** Salted aggregation correctness: identical results to the plain path on
  * a skewed key distribution, deterministic across partitionings. */
class SaltingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // hub key 0 has 5000 rows; 100 cold keys have ~10 each
  private lazy val skewed = (
    (1 to 5000).map(i => (0L, i.toDouble)) ++
      (1 to 1000).map(i => ((i % 100 + 1).toLong, i.toDouble))
    ).toDF("k", "v")

  test("saltedCount == plain groupBy count on skewed keys") {
    val plain = skewed.groupBy("k").agg(count(lit(1)).as("count"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Salting.saltedCount(skewed, "k", salts = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("saltedAgg sum/min/max == plain aggregation") {
    val plain = skewed.groupBy("k")
      .agg(sum(col("v").cast("decimal(20,2)")).as("s"), min("v").as("mn"),
        max("v").as("mx"))
      .collect().map(r => (r.getLong(0), (r.getDecimal(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    // weight-aware partials: sum rides v·__w, min/max are weight-invariant
    val salted = Salting.saltedAgg(skewed, Seq("k"), 16,
      partial = Seq(sum(col("v").cast("decimal(20,2)") * col("__w")).as("s"),
        min("v").as("mn"), max("v").as("mx")),
      merge = Seq(sum(col("s")).as("s"), min("mn").as("mn"),
        max("mx").as("mx")))
      .collect().map(r => (r.getLong(0), (r.getDecimal(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(salted.keySet === plain.keySet)
    plain.foreach { case (k, (s, mn, mx)) =>
      val (s2, mn2, mx2) = salted(k)
      assert(s2.compareTo(s) === 0, s"sum k=$k")
      assert(mn2 === mn && mx2 === mx, s"minmax k=$k")
    }
  }

  test("an input already carrying the reserved __w column is rejected " +
    "loudly (not silently mis-aggregated)") {
    val withW = skewed.withColumn(Salting.weightCol, lit(7L))
    val e = intercept[IllegalArgumentException] {
      Salting.saltedCount(withW, "k", salts = 4)
    }
    assert(e.getMessage.contains(Salting.weightCol))
  }

  test("splitHotKeys partitions rows exactly at the threshold") {
    val (hot, cold) = Salting.splitHotKeys(skewed, "k", threshold = 100)
    assert(hot.select("k").distinct().collect().map(_.getLong(0)).toSet === Set(0L))
    assert(hot.count() === 5000L)
    assert(cold.count() === 1000L)
  }

  test("a hub of IDENTICAL rows collapses to ONE weighted row (no funnel, " +
    "no spread needed); distinct hot-key rows spread across salts; final " +
    "aggregate partition-invariant") {
    // 5000 byte-identical rows of one hot key: phase 0's algebraic
    // duplicate collapse (map-side combined) folds them into a single
    // (row, __w=5000) — neither a content-salt collision NOR a window
    // funnel can occur because no stage ever collates the raw duplicates
    val hub = Seq.fill(5000)((0L, 1.0)).toDF("k", "v")
    val collapsed = Salting.collapseDuplicates(hub).collect()
    assert(collapsed.length === 1)
    assert(collapsed.head.getAs[Long]("__w") === 5000L)
    assert(Salting.saltedCount(hub, "k", 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === Map(0L -> 5000L))
    // DISTINCT rows of a hot key (the post-collapse shape) spread by the
    // pure content salt — the hot key's phase-1 work parallelizes
    val hotDistinct = Salting.collapseDuplicates(
      (1 to 5000).map(i => (0L, i.toDouble)).toDF("k", "v"))
    val perSalt = hotDistinct.withColumn("s", Salting.salt(hotDistinct, 16))
      .groupBy("s").count().collect().map(_.getLong(1))
    assert(perSalt.length > 8, s"hot key spread over ${perSalt.length} salts")
    assert(perSalt.max < 5000L / 4, s"worst salt holds ${perSalt.max} rows")
    // the salt-invariant contract: the FINAL aggregate is identical across
    // partitionings (per-salt partials may differ — documented)
    val a = Salting.saltedCount(skewed.repartition(2), "k", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Salting.saltedCount(skewed.repartition(13), "k", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }
}
