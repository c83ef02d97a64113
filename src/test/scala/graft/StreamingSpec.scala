package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Page
import graft.sources.PagesGen
import graft.streaming.EdgeStream

/** Structured-Streaming ingestion: streamed pages produce the same edge set
  * as the batch pipeline, and windowed state aggregates correctly. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def genPages: Seq[Page] =
    (0L until (10 * 6)).map(i => PagesGen.mkPage(42L, 10, 6, i))

  test("streamed link extraction == batch link extraction") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Page]
    val links = EdgeStream.links(mem.toDS())
    val edgePath = Files.createTempDirectory("graft_stream_edges").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString
    mem.addData(genPages)
    val q = EdgeStream.appendEdges(links, edgePath, ckpt).start()
    q.awaitTermination(60000)

    val streamed = spark.read.parquet(edgePath)
      .select("src", "dst").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val batch = graft.graphbuild.EdgeBuilder
      .edges(graft.graphbuild.EdgeBuilder.links(
        PagesGen.generate(spark, 10, 6, 42L, 4)))
      .select("src", "dst")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("pageRankTrigger: streamed edges reconverge to the batch ranks") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[graft.model.Link]
    val edgePath = Files.createTempDirectory("graft_prtrig_edges").toString
    val ckpt = Files.createTempDirectory("graft_prtrig_ckpt").toString
    val base = new Timestamp(1700000000000L)
    val mk = (s: String, d: String) => graft.model.Link(s, d, base)
    val results = scala.collection.mutable.ArrayBuffer[(Long, Int, Long)]()

    mem.addData((0 until 5).map(i => mk(s"p$i", s"p${i + 1}")) :+
      mk("p0", "hub") :+ mk("p3", "hub") :+ mk("p5", "hub"))
    val q = EdgeStream.pageRankTrigger(mem.toDS(), edgePath, ckpt,
      numPartitions = 4) { (id, ranks, steps) =>
      results += ((id, steps, ranks.count()))
    }.start()
    q.awaitTermination(120000)

    assert(results.nonEmpty)
    assert(results.last._3 === 7L) // p0..p5 + hub
    val full = spark.read.parquet(edgePath)
      .select(col("src_id").as("src"), col("dst_id").as("dst"))
      .dropDuplicates("src", "dst")
    assert(full.count() === 8L)
  }

  test("pageRankTrigger: incremental maintenance — overlapping batches " +
    "append only deltas, restart recovers, ranks match batch PageRank") {
    implicit val sqlCtx = spark.sqlContext
    val edgePath = Files.createTempDirectory("graft_prtrig2_edges").toString
    def ckpt() = Files.createTempDirectory("graft_prtrig2_ckpt").toString
    val base = new Timestamp(1700000000000L)
    val mk = (s: String, d: String) => graft.model.Link(s, d, base)
    val results = scala.collection.mutable.ArrayBuffer[(Long, Int, Long)]()

    val b1 = (0 until 5).map(i => mk(s"p$i", s"p${i + 1}")) :+ mk("p0", "hub")
    // batch 2 OVERLAPS batch 1 (3 dupes) + adds 2 new edges
    val b2 = Seq(mk("p0", "p1"), mk("p2", "p3"), mk("p0", "hub"),
      mk("p3", "hub"), mk("p5", "hub"))

    val mem1 = MemoryStream[graft.model.Link]
    mem1.addData(b1)
    EdgeStream.pageRankTrigger(mem1.toDS(), edgePath, ckpt(), numPartitions = 4) {
      (id, ranks, steps) => results += ((id, steps, ranks.count()))
    }.start().awaitTermination(120000)

    // separate query, FRESH checkpoint, same table: exercises the restart
    // path — one-time recovery read of the accumulated table, then the
    // anti-join guard keeps the overlapping rows out of the append
    val mem2 = MemoryStream[graft.model.Link]
    mem2.addData(b2)
    EdgeStream.pageRankTrigger(mem2.toDS(), edgePath, ckpt(), numPartitions = 4) {
      (id, ranks, steps) => results += ((id, steps, ranks.count()))
    }.start().awaitTermination(120000)

    assert(results.size >= 2)
    // delta-only appends: the on-disk table holds exactly the distinct
    // edges (8), NOT 11 = |b1| + |b2| — overlapping rows never re-appended
    val disk = spark.read.parquet(edgePath)
    assert(disk.count() === 8L, "accumulated table must be duplicate-free")
    assert(disk.dropDuplicates("src_id", "dst_id").count() === 8L)

    // converged ranks equal a cold batch PageRank over the full edge set
    val full = (b1 ++ b2).map(l => (l.src, l.dst)).distinct.toDF("src", "dst")
      .select(xxhash64(col("src")).as("src"), xxhash64(col("dst")).as("dst"))
    val batchRanks = graft.algo.PageRank.run(full,
        graft.algo.PageRank.Params(tol = 1e-6, numPartitions = 4))
      .state.collect().map(r => r.getLong(0) -> r.getAs[Double]("rank")).toMap
    val mem3 = MemoryStream[graft.model.Link]
    mem3.addData(Seq(mk("p0", "p1"))) // no-op delta (already known)
    var streamRanks = Map.empty[Long, Double]
    EdgeStream.pageRankTrigger(mem3.toDS(), edgePath, ckpt(), numPartitions = 4) {
      (_, ranks, _) =>
        streamRanks = ranks.collect()
          .map(r => r.getLong(0) -> r.getAs[Double]("rank")).toMap
    }.start().awaitTermination(120000)
    assert(streamRanks.keySet === batchRanks.keySet)
    streamRanks.foreach { case (id, r) =>
      assert(math.abs(r - batchRanks(id)) < 1e-4, s"rank mismatch for $id")
    }
  }

  test("pageRankTrigger: bounded-state watermarked dedup — in-window " +
    "duplicates collapse, table and ranks match the unbounded variant") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[graft.model.Link]
    val edgePath = Files.createTempDirectory("graft_prtrig3_edges").toString
    val ckpt = Files.createTempDirectory("graft_prtrig3_ckpt").toString
    val base = 1700000000000L
    // duplicates within one minute — all inside the 10-minute dedup window
    val mk = (s: String, d: String, offSec: Int) =>
      graft.model.Link(s, d, new Timestamp(base + offSec * 1000L))
    mem.addData((0 until 5).map(i => mk(s"p$i", s"p${i + 1}", i)) ++
      Seq(mk("p0", "p1", 30), mk("p0", "hub", 10), mk("p0", "hub", 40)))
    var ranksN = 0L
    val q = EdgeStream.pageRankTrigger(mem.toDS(), edgePath, ckpt,
      numPartitions = 4, dedupWithinWatermark = Some("10 minutes")) {
      (_, ranks, _) => ranksN = ranks.count()
    }.start()
    q.awaitTermination(120000)
    assert(ranksN === 7L) // p0..p5 + hub
    val disk = spark.read.parquet(edgePath).select("src_id", "dst_id")
    assert(disk.count() === 6L, "watermarked dedup must collapse in-window dupes")
    assert(disk.distinct().count() === 6L)
  }

  test("pageRankTrigger: a replayed batch (failure after the delta append) " +
    "never duplicates or erases table rows — batchId-keyed idempotent writes") {
    // file source (not MemoryStream): checkpoint recovery across query
    // instances is what replays the batch
    val srcDir = Files.createTempDirectory("graft_prtrig4_src").toString
    val edgePath = Files.createTempDirectory("graft_prtrig4_edges").toString
    val ckpt = Files.createTempDirectory("graft_prtrig4_ckpt").toString
    val base = new Timestamp(1700000000000L)
    ((0 until 5).map(i => (s"p$i", s"p${i + 1}", base)) :+
      (("p0", "hub", base))).toDF("src", "dst", "ts")
      .coalesce(1).write.mode("overwrite").parquet(srcDir)
    def linkStream = spark.readStream
      .schema("src string, dst string, ts timestamp")
      .parquet(srcDir).as[graft.model.Link]

    // run 1: fail AFTER the delta append (inside onRanks) — the batch's
    // partition is on disk but the batch never committed
    val q1 = EdgeStream.pageRankTrigger(linkStream, edgePath, ckpt,
      numPartitions = 4) { (_, _, _) =>
      sys.error("injected post-append failure")
    }.start()
    intercept[Exception] { q1.awaitTermination(120000) }
    val afterFail = spark.read.parquet(edgePath)
      .select("src_id", "dst_id").collect().toSet
    assert(afterFail.size === 6, "failed attempt still appended its delta once")

    // run 2, SAME checkpoint: Structured Streaming replays the uncommitted
    // batch; the recovered known-set makes its delta empty, the write is
    // skipped (not an erasing overwrite), and the run completes
    var ranksN = 0L
    val q2 = EdgeStream.pageRankTrigger(linkStream, edgePath, ckpt,
      numPartitions = 4) { (_, ranks, _) => ranksN = ranks.count() }.start()
    q2.awaitTermination(120000)
    assert(ranksN === 7L)
    val afterReplay = spark.read.parquet(edgePath)
      .select("src_id", "dst_id").collect().toSet
    assert(afterReplay === afterFail,
      "replay must neither duplicate nor erase the batch partition")
  }

  test("PageRank warm start: immediate on unchanged graph, fewer steps " +
    "after a small edge delta") {
    val g0 = ((0L until 5L).map(i => (i, i + 1)) ++ Seq((0L, 99L), (3L, 99L)))
      .toDF("src", "dst")
    val g1 = g0.union(Seq((5L, 99L)).toDF("src", "dst"))
    val p = graft.algo.PageRank.Params(tol = 1e-6, numPartitions = 4)

    val cold0 = graft.algo.PageRank.run(g0, p)
    val warmRanks = cold0.state.select(col("id"), col("rank"))

    // same graph, warm start from its own converged ranks → ≤2 supersteps
    val same = graft.algo.PageRank.run(g0, p, None, Some(warmRanks))
    assert(same.steps <= 2, s"steps=${same.steps}")

    // grown graph: warm start converges in fewer steps than cold, to the
    // same ranks
    val cold1 = graft.algo.PageRank.run(g1, p)
    val warm1 = graft.algo.PageRank.run(g1, p, None, Some(warmRanks))
    assert(warm1.steps < cold1.steps,
      s"warm ${warm1.steps} vs cold ${cold1.steps}")
    val c = cold1.state.collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("rank")).toMap
    warm1.state.collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("rank") - c(r.getLong(0))) < 1e-4)
    }
  }

  test("windowed in-degree counts with watermark produce complete windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[graft.model.Link]
    val base = 1700000000000L
    val mk = (src: String, dst: String, offMin: Int) =>
      graft.model.Link(src, dst, new Timestamp(base + offMin * 60000L))
    mem.addData(Seq(
      mk("a", "hub", 0), mk("b", "hub", 1), mk("c", "hub", 6),
      mk("a", "x", 2)))
    val out = EdgeStream.windowedInDegree(mem.toDS(),
      window = "10 minutes", slide = "10 minutes", watermark = "1 minute")
    val q = out.writeStream.format("memory").queryName("win_deg")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("win_deg")
        .select(col("dst"), col("in_degree")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows("hub") === 3L)
      assert(rows("x") === 1L)
    } finally q.stop()
  }

  test("windowedHostEdges: closed-window stream contraction ≡ batch " +
       "HostGraph.contract on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[graft.model.Link]
    val base = 1700000000000L // 200 s into its 10-min tumbling window
    val urls = Seq( // the HostGraphSpec fixture: dups, subdomains, intra-host, IP
      ("http://www.a.co.uk/p1", "http://b.com/x"),
      ("http://www.a.co.uk/p1", "http://b.com/x"), // exact url dup
      ("http://www.a.co.uk/p2", "http://b.com/x"),
      ("http://m.a.co.uk/p3", "http://b.com/y"),
      ("http://sub1.b.com/p", "http://b.com/q"),   // intra-host → dropped
      ("http://192.168.0.1/p", "http://b.com/z"),  // null host → dropped
      ("http://b.com/r", "http://www.a.co.uk/s"))
    mem.addData(urls.zipWithIndex.map { case ((s, d), i) =>
      graft.model.Link(s, d, new Timestamp(base + i * 1000L)) })
    val out = EdgeStream.windowedHostEdges(mem.toDS(),
      window = "10 minutes", watermark = "5 minutes")
    val q = out.writeStream.format("memory").queryName("hostwin")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // advance the watermark past the fixture window so append emits it
      mem.addData(Seq(graft.model.Link("http://later1.org/a",
        "http://later2.org/b", new Timestamp(base + 1800 * 1000L))))
      q.processAllAvailable()
      mem.addData(Seq(graft.model.Link("http://later3.org/a",
        "http://later4.org/b", new Timestamp(base + 3600 * 1000L))))
      q.processAllAvailable()
      val winStart = new Timestamp(base - (base % 600000L))
      val got = spark.table("hostwin")
        .where(col("win_start") === winStart)
        .select("src_host", "dst_host", "weight")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      val want = graft.graphbuild.HostGraph.contract(urls.toDF("src", "dst"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(got === want && got.nonEmpty,
        s"stream window ≠ batch contraction: $got vs $want")
    } finally q.stop()
  }
}
