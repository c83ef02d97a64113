package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.algo.{PageRank, Superstep}
import graft.checkpoint.{SnapshotStore, StepMetrics}

/** Iceberg-shaped checkpoint store: snapshot-log lineage, manifest-driven
  * reads (orphans invisible), version-hint atomic commit, time travel,
  * expiry, and drop-in resume parity inside the Superstep driver. */
class SnapshotStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges = (
    (0L to 19L).map(i => (i, (i + 1) % 20)) ++
      (20L to 29L).map(i => (i, 20L + (i + 3) % 10)) ++
      Seq((0L, 20L), (20L, 0L), (5L, 30L))
    ).toDF("src", "dst")

  private def newRoot(): String =
    Files.createTempDirectory("graft_snap").toString

  test("commit/latest round-trips state and metrics; snapshot log carries " +
    "parent lineage in superstep order") {
    val root = newRoot()
    val store = new SnapshotStore(root, "run1")
    val s1 = Seq((1L, 0.5), (2L, 0.5)).toDF("id", "rank").repartition(2)
    val s2 = Seq((1L, 0.6), (2L, 0.4)).toDF("id", "rank").repartition(2)

    store.commit(2, s1, StepMetrics(2, 0.1, 2L, 1.0, Seq(1L, 1L)))
    store.commit(4, s2, StepMetrics(4, 0.05, 2L, 1.0, Seq(1L, 1L)))

    val Some((step, df, m)) = store.latest(spark)
    assert(step === 4)
    assert(m.measure === 0.05)
    assert(m.partRows === Seq(1L, 1L))
    assert(df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap ===
      Map(1L -> 0.6, 2L -> 0.4))

    val log = store.snapshots()
    assert(log.map(_.step) === Seq(2, 4))
    assert(log.map(_.parentStep) === Seq(-1, 2), "lineage: 4's parent is 2")
    assert(log.forall(s => s.files > 0 && s.bytes > 0))
    assert(store.metricsLog().map(_.step) === Seq(2, 4))
  }

  test("manifest file lists round-trip paths containing commas " +
    "(escape-aware strArr, not a split-on-comma)") {
    // a comma in the table root lands in every data-file path the manifest
    // records; a comma-split parser would return truncated garbage paths
    // and break resume exactly when it is needed
    val root = Files.createTempDirectory("graft_snap,v2").toString
    assert(root.contains(","))
    val store = new SnapshotStore(root, "run1")
    val s = Seq((1L, 0.5), (2L, 0.5)).toDF("id", "rank").repartition(2)
    store.commit(3, s, StepMetrics(3, 0.1, 2L, 1.0, Seq(1L, 1L)))
    val Some((step, df, _)) = store.latest(spark)
    assert(step === 3)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    val log = store.snapshots()
    assert(log.map(_.step) === Seq(3) && log.head.files > 0)
  }

  test("reads are manifest-driven: orphan parquet files from an " +
    "uncommitted attempt in the data dir are invisible") {
    val root = newRoot()
    val store = new SnapshotStore(root, "run1")
    val good = Seq((1L, 1.0)).toDF("id", "rank").coalesce(1)
    store.commit(1, good, StepMetrics(1, 0.0, 1L, 0.1, Seq(1L)))

    // simulate a crashed re-attempt: extra parquet lands in the SAME data
    // dir after the commit (never referenced by the committed manifest)
    val orphanDir = Paths.get(root, "run1", "data", "step_1")
    val orphanSrc = Files.createTempDirectory("orphan")
    Seq((99L, 9.9)).toDF("id", "rank").coalesce(1)
      .write.mode("overwrite").parquet(orphanSrc.toString)
    import scala.jdk.CollectionConverters._
    val part = Files.list(orphanSrc).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.copy(part, orphanDir.resolve("part-orphan.parquet"))

    val Some((_, df, _)) = store.latest(spark)
    assert(df.collect().map(_.getLong(0)).toSet === Set(1L),
      "orphan row must not be visible through the manifest read")
    // a directory read WOULD see it — proving the manifest is load-bearing
    assert(spark.read.parquet(orphanDir.toString).count() === 2)
  }

  test("a data write without a hint swing is invisible (commit point is " +
    "the version hint)") {
    val root = newRoot()
    val store = new SnapshotStore(root, "run1")
    // write data the way a crash-before-metadata leaves it: parquet only
    Seq((1L, 1.0)).toDF("id", "rank")
      .write.parquet(Paths.get(root, "run1", "data", "step_3").toString)
    assert(store.latest(spark).isEmpty)
    assert(store.metricsLog().isEmpty)
    assert(store.snapshots().isEmpty)
  }

  test("time travel returns any retained snapshot; expire drops old data " +
    "but never the current snapshot") {
    val root = newRoot()
    val store = new SnapshotStore(root, "run1")
    (1 to 4).foreach { k =>
      val df = Seq((k.toLong, k * 1.0)).toDF("id", "rank").coalesce(1)
      store.commit(k, df, StepMetrics(k, 1.0 / k, 1L, 0.1, Seq(1L)))
    }
    assert(store.stateAt(spark, 2).get.collect()(0).getLong(0) === 2L)

    val dropped = store.expireSnapshots(keepLast = 2)
    assert(dropped === Seq(1, 2))
    assert(store.snapshots().map(_.step) === Seq(3, 4))
    assert(store.stateAt(spark, 2).isEmpty, "expired snapshot gone from log")
    assert(!Files.exists(Paths.get(root, "run1", "data", "step_1")),
      "expired data dir deleted")
    // current snapshot still fully readable
    val Some((step, df, _)) = store.latest(spark)
    assert(step === 4 && df.count() === 1)
    // re-expire is a no-op
    assert(store.expireSnapshots(keepLast = 2) === Seq.empty)
  }

  test("re-commit of the same step (retry) replaces the log entry in " +
    "place, keeping its original parent") {
    val root = newRoot()
    val store = new SnapshotStore(root, "run1")
    val df1 = Seq((1L, 1.0)).toDF("id", "rank").coalesce(1)
    val df2 = Seq((1L, 2.0)).toDF("id", "rank").coalesce(1)
    store.commit(1, df1, StepMetrics(1, 0.5, 1L, 0.1, Seq(1L)))
    store.commit(2, df1, StepMetrics(2, 0.4, 1L, 0.1, Seq(1L)))
    store.commit(2, df2, StepMetrics(2, 0.3, 1L, 0.1, Seq(1L))) // retry
    val log = store.snapshots()
    assert(log.map(_.step) === Seq(1, 2))
    assert(log.map(_.parentStep) === Seq(-1, 1))
    val Some((_, df, m)) = store.latest(spark)
    assert(m.measure === 0.3)
    assert(df.collect()(0).getDouble(1) === 2.0)
  }

  test("drop-in for Superstep: interrupted PageRank resumes from the " +
    "snapshot store bit-identical to an uninterrupted run") {
    val root = newRoot()
    val full = PageRank.run(edges,
        PageRank.Params(tol = 0.0, maxIter = 12, numPartitions = 4))
      .state.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val storeA = new SnapshotStore(root, "run1")
    PageRank.run(edges, PageRank.Params(tol = 0.0, maxIter = 6, numPartitions = 4),
      Some(Superstep.Config(4, 6, tol = 0.0, checkpointEvery = 2,
        store = Some(storeA))))
    assert(storeA.metricsLog().last.step === 6)
    assert(storeA.metricsLog().last.partRows.sum ===
      storeA.metricsLog().last.rows)

    val storeB = new SnapshotStore(root, "run1")
    val resumed = PageRank.run(edges,
      PageRank.Params(tol = 0.0, maxIter = 12, numPartitions = 4),
      Some(Superstep.Config(4, 12, tol = 0.0, checkpointEvery = 2,
        store = Some(storeB))))
    assert(resumed.steps === 12)
    val got = resumed.state.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === full, "resumed run must be bit-identical")
    // lineage across the interruption: 8's parent is the resume point 6
    val steps = storeB.snapshots().map(s => s.step -> s.parentStep).toMap
    assert(steps(8) === 6)
  }
}
