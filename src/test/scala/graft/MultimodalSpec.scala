package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Asset, Assets, StubCodec}

/** Multimodal plumbing: codec round-trip, decode determinism across
  * partitionings, frame sampling shapes, malformed-input tolerance. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stub codec round-trips header fields") {
    val body = Array.tabulate[Byte](100)(_.toByte)
    val enc = StubCodec.encode("video", 640, 480, 3, 24, body)
    val d = StubCodec.decode(enc).get
    assert(d.kind === "video")
    assert(d.width === 640)
    assert(d.height === 480)
    assert(d.channels === 3)
    assert(d.frames === 24)
    assert(d.body.toSeq === body.toSeq)
  }

  test("decode rejects malformed payloads without failing the task") {
    val junk = Seq(
      Asset(1L, "image", Array[Byte](1, 2, 3)),
      Asset(2L, "image", null),
      Asset(3L, "image", Array.fill[Byte](32)(0x7f)))
    val out = Assets.decodeMeta(junk.toDS()).collect()
    assert(out.isEmpty)
  }

  test("generated assets decode deterministically across partitionings") {
    val m1 = Assets.decodeMeta(Assets.generate(spark, 50, partitions = 1))
      .collect().map(m => m.asset_id -> m).toMap
    val m8 = Assets.decodeMeta(Assets.generate(spark, 50, partitions = 8))
      .collect().map(m => m.asset_id -> m).toMap
    assert(m1.keySet === m8.keySet)
    m1.foreach { case (id, m) => assert(m === m8(id)) }
    assert(m1.values.map(_.kind).toSet === Set("image", "audio", "video"))
  }

  test("sampleFrames yields ceil(frames/stride) frames per video") {
    val assets = Assets.generate(spark, 60)
    val metas = Assets.decodeMeta(assets).filter(_.kind == "video")
      .collect().map(m => m.asset_id -> m.frames).toMap
    val frames = Assets.sampleFrames(assets, stride = 4)
      .groupBy("asset_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(frames.keySet === metas.keySet)
    metas.foreach { case (id, f) =>
      assert(frames(id) === (f + 3) / 4, s"asset $id frames=$f")
    }
  }

  test("resize rewrites image headers only") {
    val assets = Assets.generate(spark, 40)
    val before = Assets.decodeMeta(assets).collect().map(m => m.asset_id -> m.kind).toMap
    val after = Assets.decodeMeta(Assets.resize(assets, 64, 64)).collect()
    after.foreach { m =>
      if (before(m.asset_id) == "image") {
        assert(m.width === 64 && m.height === 64)
      } else assert(m.kind === before(m.asset_id))
    }
  }

  test("features histogram is a normalized 16-bin distribution") {
    val f = Assets.features(Assets.generate(spark, 30)).collect()
    assert(f.nonEmpty)
    f.foreach { af =>
      assert(af.histogram.length === 16)
      assert(math.abs(af.histogram.sum - 1.0) < 1e-9)
    }
  }
}
