package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Asset, Assets, Codecs, StubCodec}

/** Multimodal plumbing: codec round-trip, decode determinism across
  * partitionings, frame sampling shapes, malformed-input tolerance. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("md5Shape equals the hex-prefix recipe DuckDB mirrors") {
    // independent derivation: first 16 hex chars of the md5 as a
    // two's-complement BIGINT (the d4 hi/lo split the m1 oracle SQL uses)
    for ((seed, i, k) <- Seq((42L, 0L, 0L), (42L, 5L, 3L), (42L, 299L, 8L),
                             (7L, 123L, 6L))) {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${seed}_${i}_$k".getBytes("UTF-8"))
        .take(8).map(b => f"${b & 0xff}%02x").mkString
      val expect = new java.math.BigInteger(hex, 16).longValue()
      assert(Assets.md5Shape(seed, i, k) === expect, s"($seed,$i,$k)")
    }
    // genuinely different family from the SplitMix default
    assert(Assets.md5Shape(42L, 1L, 1L) !== graft.core.Hashing.h(42L, 1L, 1L))
  }

  test("portable-shape generator still decodes cleanly end-to-end") {
    val metas = Assets.decodeMeta(
      Assets.generate(spark, n = 60, shapeHash = Assets.md5Shape)).collect()
    assert(metas.length === 60) // no malformed drops
    assert(metas.map(_.kind).toSet === Set("image", "audio", "video"))
    // decoded dims re-derive from the SAME portable hash the oracle uses
    metas.filter(_.kind == "image").foreach { m =>
      val w = 4 + graft.core.Hashing.bounded(
        Assets.md5Shape(42L, m.asset_id, 1L), 8) * 4
      assert(m.width === w, s"asset ${m.asset_id}")
    }
  }

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

  test("PPM round-trip incl. comment headers (real parser)") {
    val rgb = Array.tabulate[Byte](2 * 2 * 3)(i => (i * 10).toByte)
    val d = Codecs.decode(Codecs.encodePpm(2, 2, rgb)).get
    assert(d.kind === "image" && d.format === "ppm")
    assert(d.width === 2 && d.height === 2 && d.channels === 3)
    assert(d.body.toSeq === rgb.toSeq)
    val withComment =
      ("P6\n# a netpbm comment\n2 2\n255\n").getBytes("US-ASCII") ++ rgb
    val dc = Codecs.decode(withComment).get
    assert(dc.width === 2 && dc.height === 2 && dc.body.toSeq === rgb.toSeq)
  }

  test("BMP decode normalizes to top-down unpadded RGB (row padding, " +
    "bottom-up storage, BGR order all undone)") {
    // 2x2 image, w=2 → rowBytes 8 (2 pad bytes/row). Target top-down RGB:
    // (1,2,3)(4,5,6) / (7,8,9)(10,11,12)
    val bgr = Array[Byte](
      9, 8, 7, 12, 11, 10, 0, 0, // BMP row 0 = image BOTTOM row, BGR
      3, 2, 1, 6, 5, 4, 0, 0)    // BMP row 1 = image top row
    val d = Codecs.decode(Codecs.encodeBmp(2, 2, bgr)).get
    assert(d.kind === "image" && d.format === "bmp")
    assert(d.width === 2 && d.height === 2 && d.channels === 3)
    assert(d.body.toSeq === Seq[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
  }

  test("WAV round-trip (RIFF/PCM16, real parser)") {
    val samples = Array.tabulate[Short](20)(i => (i * 1000).toShort)
    val d = Codecs.decode(Codecs.encodeWav(2, 8000, samples)).get
    assert(d.kind === "audio" && d.format === "wav")
    assert(d.channels === 2 && d.width === 8000) // width carries sample rate
    assert(d.frames === 10) // 20 samples / 2 channels
    assert(d.body.length === 40)
  }

  test("resize is a real nearest-neighbor resample (PPM output)") {
    // 2x1 image: red pixel | blue pixel → 4x2: left half red, right blue
    val rgb = Array[Byte](-1, 0, 0, 0, 0, -1) // (255,0,0), (0,0,255)
    val src = Seq(Asset(7L, "image", Codecs.encodePpm(2, 1, rgb))).toDS()
    val out = Assets.resize(src, 4, 2).collect()(0)
    val d = Codecs.decode(out.bytes).get
    assert(d.format === "ppm" && d.width === 4 && d.height === 2)
    for (y <- 0 until 2; x <- 0 until 4) {
      val p = (y * 4 + x) * 3
      val expected = if (x < 2) Seq(-1, 0, 0) else Seq(0, 0, -1)
      assert(Seq(d.body(p), d.body(p + 1), d.body(p + 2)).map(_.toInt)
        === expected.map(_.toInt), s"pixel ($x,$y)")
    }
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
