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
}
