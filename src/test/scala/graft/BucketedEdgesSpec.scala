package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.PageRank
import graft.sources.BucketedEdges

/** Bucketed edge-table reads must carry HashPartitioning(src, buckets) into
  * downstream plans: src-keyed aggregation with ZERO exchanges, and
  * prePartitioned PageRank identical to the default path. */
class BucketedEdgesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // count real shuffle exchanges (ShuffleExchangeExec prints as
  // "Exchange hashpartitioning(...)"); excludes ReusedExchange/QueryStage
  // wrapper noise in AQE plan strings
  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    "(?<!Reused)Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  private val table = "graft_spec_edges_bucketed"
  private val buckets = 4 // == TestSpark shuffle partitions / algo P below

  private def fixtureEdges = {
    // small power-law-ish digraph with a hub, dangling nodes, a 2-cycle
    val rnd = new scala.util.Random(7)
    val pairs = (0 until 400).map { _ =>
      val s = rnd.nextInt(40).toLong
      val d = (if (rnd.nextInt(4) == 0) 0L else rnd.nextInt(60).toLong)
      (s, d)
    }.distinct.filter { case (s, d) => s != d }
    pairs.toDF("src", "dst")
  }

  private def writeFixture(): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    BucketedEdges.write(fixtureEdges, table, buckets, Some(s"$dir/edges"))
  }

  test("bucketed scan plans src-keyed aggregation with zero exchanges") {
    writeFixture()
    try {
      val deg = BucketedEdges.outDegrees(spark, table)
      assert(deg.count() > 0)
      assert(exchanges(deg) === 0,
        s"bucketed out-degree must not shuffle:\n${deg.queryExecution.executedPlan}")
      // the same aggregation over the un-bucketed frame DOES shuffle —
      // the assertion above is meaningful, not vacuous
      val plainDeg = fixtureEdges.groupBy(col("src")).agg(count(lit(1)))
      plainDeg.count()
      assert(exchanges(plainDeg) >= 1)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("bucketed edge ⋈ repartitioned state join needs no edge-side exchange") {
    writeFixture()
    try {
      val e = BucketedEdges.read(spark, table)
      // the superstep shape: state hash-partitioned on id at the same width
      val ids = fixtureEdges.select(col("src")).as[Long].collect().distinct.toSeq
      val state = ids.toDF("id").repartition(buckets, col("id"))
        .withColumn("rank", lit(1.0))
      val joined = e.join(state, e("src") === state("id"))
      joined.count()
      // the state side pays its one repartition exchange; a second exchange
      // would mean the bucketed edge side is being re-shuffled
      assert(exchanges(joined) <= 1,
        s"edge side re-shuffled:\n${joined.queryExecution.executedPlan}")
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("prePartitioned PageRank over the bucketed table matches the default path") {
    writeFixture()
    try {
      val e = BucketedEdges.read(spark, table)
      val p = PageRank.Params(tol = 1e-10, maxIter = 60, numPartitions = buckets)
      val base = PageRank.run(fixtureEdges, p)
      val bucketed = PageRank.run(e, p.copy(prePartitioned = true))
      val baseM = base.state.as[(Long, Double)].collect().toMap
      val bucketedM = bucketed.state.as[(Long, Double)].collect().toMap
      assert(bucketedM.keySet === baseM.keySet)
      baseM.foreach { case (id, r) =>
        assert(math.abs(bucketedM(id) - r) < 1e-9, s"rank mismatch at $id") }
      // steps not asserted equal: the bucketed write is sortBy(src), so
      // per-partition float summation ORDER differs — deltas can cross the
      // tol boundary one step apart while ranks agree to ≲1e-12
      graft.core.Checkpoints.releaseLeaves(base.state)
      graft.core.Checkpoints.releaseLeaves(bucketed.state)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("prePartitioned rejects non-long ids loudly") {
    val bad = Seq(("a", "b")).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      PageRank.run(bad, PageRank.Params(numPartitions = 2, prePartitioned = true))
    }
    assert(ex.getMessage.contains("long ids"))
  }

  test("restoreAutoBucketedScan undoes read()'s session-wide flag pin " +
    "(back to the pre-first-read value, repeated reads included)") {
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val before = spark.conf.getOption(key)
    writeFixture()
    try {
      spark.conf.set(key, "true") // a host session's explicit setting
      BucketedEdges.read(spark, table).count()
      assert(spark.conf.get(key) === "false", "read() must pin the flag off")
      BucketedEdges.read(spark, table).count() // second read: same save slot
      BucketedEdges.restoreAutoBucketedScan(spark)
      assert(spark.conf.get(key) === "true",
        "restore must return the PRE-FIRST-READ value, not 'false'")
      // idempotent: a second restore with nothing saved is a no-op
      BucketedEdges.restoreAutoBucketedScan(spark)
      assert(spark.conf.get(key) === "true")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      before match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }
}
