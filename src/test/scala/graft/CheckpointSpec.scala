package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.algo.{PageRank, Superstep}
import graft.checkpoint.ParquetStore

/** Checkpoint/resume correctness (north rule: resumable mid-convergence):
  * a run killed after superstep k resumes from the durable store and
  * finishes bit-identical to an uninterrupted run; manifests carry
  * per-partition lineage. */
class CheckpointSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic digraph: 3 rings with cross links + dangling tail
  private def edges = (
    (0L to 19L).map(i => (i, (i + 1) % 20)) ++
      (20L to 29L).map(i => (i, 20L + (i + 3) % 10)) ++
      Seq((0L, 20L), (20L, 0L), (5L, 30L)) // 30 is dangling
    ).toDF("src", "dst")

  test("interrupted PageRank resumes from the last committed superstep " +
    "and ends bit-identical to an uninterrupted run") {
    val root = Files.createTempDirectory("graft_ckpt").toString

    // uninterrupted reference run (no store)
    val full = PageRank.run(edges,
        PageRank.Params(tol = 0.0, maxIter = 12, numPartitions = 4))
      .state.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // run A: commit every 2 steps, stop hard at step 6 via maxIter
    val storeA = new ParquetStore(root, "run1")
    PageRank.run(edges, PageRank.Params(tol = 0.0, maxIter = 6, numPartitions = 4),
      Some(Superstep.Config(4, 6, tol = 0.0, checkpointEvery = 2,
        store = Some(storeA))))
    val committed = storeA.metricsLog()
    assert(committed.nonEmpty)
    assert(committed.last.step === 6)
    assert(committed.last.partRows.sum === committed.last.rows,
      "per-partition lineage rows must sum to the state rowcount")

    // run B: same store, resumes at 6, continues to 12
    val storeB = new ParquetStore(root, "run1")
    val resumed = PageRank.run(edges,
      PageRank.Params(tol = 0.0, maxIter = 12, numPartitions = 4),
      Some(Superstep.Config(4, 12, tol = 0.0, checkpointEvery = 2,
        store = Some(storeB))))
    assert(resumed.steps === 12)
    val got = resumed.state.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    assert(got.keySet === full.keySet)
    // parquet round-trip may reorder rows within a partition, which can
    // permute float-sum reduce order — allow ulp-level slack (≪ the 1e-6
    // convergence tolerance the north rule pins).
    full.foreach { case (id, r) =>
      assert(math.abs(got(id) - r) < 1e-12, s"vertex $id diverged after resume")
    }
  }

  test("async checkpointing commits the same snapshots as sync, resumes, " +
    "and matches the uninterrupted run") {
    val root = Files.createTempDirectory("graft_ckpt_async").toString

    val full = PageRank.run(edges,
        PageRank.Params(tol = 0.0, maxIter = 12, numPartitions = 4))
      .state.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // run A (async writes): stop hard at 6; the final pending commit must
    // be durable when run() returns
    val storeA = new ParquetStore(root, "runAsync")
    PageRank.run(edges, PageRank.Params(tol = 0.0, maxIter = 6, numPartitions = 4),
      Some(Superstep.Config(4, 6, tol = 0.0, checkpointEvery = 2,
        store = Some(storeA), asyncCheckpoint = true)))
    val committed = storeA.metricsLog()
    assert(committed.map(_.step) === Seq(2, 4, 6),
      "async mode must land exactly the sync commit schedule, in order")
    assert(committed.last.partRows.sum === committed.last.rows)

    // run B resumes from the async-written store and continues (async too)
    val resumed = PageRank.run(edges,
      PageRank.Params(tol = 0.0, maxIter = 12, numPartitions = 4),
      Some(Superstep.Config(4, 12, tol = 0.0, checkpointEvery = 2,
        store = Some(new ParquetStore(root, "runAsync")),
        asyncCheckpoint = true)))
    assert(resumed.steps === 12)
    val got = resumed.state.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === full.keySet)
    full.foreach { case (id, r) =>
      assert(math.abs(got(id) - r) < 1e-12, s"vertex $id diverged (async)")
    }
  }

  test("a LANDED async commit's snapshot is released by the per-step poll, " +
    "not held until the next checkpoint boundary") {
    // checkpointEvery=3, maxIter=7 → commits at steps 3 and 6. The step-3
    // snapshot's write completes during the step-4 iteration (next() awaits
    // the latch); the step-5 iteration's poll must release it — so by the
    // step-6 iteration's next(), the only pinned loop block is prev.
    // Pre-fix behavior (release only inside awaitPending at the NEXT
    // checkpoint) leaves the step-3 snapshot pinned here too.
    val landed = new java.util.concurrent.CountDownLatch(1)
    val store = new graft.checkpoint.CheckpointStore {
      override def commit(step: Int, state: org.apache.spark.sql.DataFrame,
                          metrics: graft.checkpoint.StepMetrics): Unit =
        if (step == 3) landed.countDown()
      override def latest(spark: org.apache.spark.sql.SparkSession) = None
      override def metricsLog() = Seq.empty
    }
    val base = spark.sparkContext.getPersistentRDDs.keySet
    var extraAtStep5 = -1
    val res = Superstep.run(spark,
      (0L until 8L).map(i => (i, 0.0)).toDF("id", "v"),
      Superstep.Config(2, 7, tol = 0.0, checkpointEvery = 3,
        store = Some(store), fixedStep = true, asyncCheckpoint = true)) {
      (prev, step) =>
        if (step == 3) assert(landed.await(30,
          java.util.concurrent.TimeUnit.SECONDS), "step-3 commit never ran")
        if (step == 5)
          extraAtStep5 =
            (spark.sparkContext.getPersistentRDDs.keySet -- base).size
        prev.withColumn("v", col("v") + lit(1.0))
    } { _ => Double.MaxValue }
    assert(extraAtStep5 === 1,
      "two steps after its write landed, the async snapshot must be " +
        s"released — only prev may remain pinned, saw $extraAtStep5 blocks")
    graft.core.Checkpoints.releaseLeaves(res.state)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- base
    assert(leaked.isEmpty, s"run left pinned blocks: $leaked")
  }

  test("a FAILED async commit surfaces loudly and releases the pinned " +
    "pending snapshot (no retained-block leak on the failure path)") {
    val root = Files.createTempDirectory("graft_ckpt_fail").toString
    val inner = new ParquetStore(root, "runFail")
    // injected failure on the MIDDLE commit (step 4 of 2/4/6): the pending
    // snapshot is not the current state when awaited, so a leak is visible
    val failing = new graft.checkpoint.CheckpointStore {
      override def commit(step: Int, state: org.apache.spark.sql.DataFrame,
                          metrics: graft.checkpoint.StepMetrics): Unit =
        if (step == 4) sys.error("injected commit failure")
        else inner.commit(step, state, metrics)
      override def latest(spark: org.apache.spark.sql.SparkSession) =
        inner.latest(spark)
      override def metricsLog() = inner.metricsLog()
    }
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val e = intercept[RuntimeException] {
      PageRank.run(edges, PageRank.Params(tol = 0.0, maxIter = 6,
          numPartitions = 4),
        Some(Superstep.Config(4, 6, tol = 0.0, checkpointEvery = 2,
          store = Some(failing), asyncCheckpoint = true)))
    }
    assert(e.getMessage.contains("injected commit failure"),
      "the background failure must surface, not vanish")
    // abort path must be block-clean: the failed commit's pinned snapshot,
    // the in-flight loop states (Superstep finally), and PageRank's cached
    // edge/vertex tables (its finally) are all released. This also guards
    // the REAL release mechanism: Dataset.unpersist silently no-ops on
    // localCheckpoint'd frames, so a regression from Checkpoints.release
    // back to it shows up here as leaked superstep states.
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"abort path leaked persistent blocks: $leaked")
  }

  test("success path pins ONLY the final state: superseded superstep " +
    "checkpoints and the edge/vertex caches are released deterministically " +
    "(not left to driver GC), and releaseLeaves drops the last one") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val res = PageRank.run(edges, PageRank.Params(tol = 1e-8, maxIter = 12,
      numPartitions = 4))
    assert(res.steps > 2, "fixture must actually iterate")
    res.state.count() // consume
    val pinned = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(pinned.size == 1,
      s"a ${res.steps}-superstep run must pin exactly the final state, " +
        s"got ${pinned.size}: $pinned")
    graft.core.Checkpoints.releaseLeaves(res.state)
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after.isEmpty, s"releaseLeaves left blocks pinned: $after")
  }

  test("commit is atomic: orphan data without manifest is never resumed") {
    val root = Files.createTempDirectory("graft_ckpt2").toString
    val store = new ParquetStore(root, "runX")
    assert(store.latest(spark).isEmpty)
    // fake an orphan state dir (crash between data write and manifest move)
    val orphan = new java.io.File(s"$root/runX/state_3")
    orphan.mkdirs()
    assert(store.latest(spark).isEmpty)
  }
}
