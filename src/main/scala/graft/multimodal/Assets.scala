package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for the training-data tier: image/audio/video as
  * opaque `binary` payloads with typed metadata, plus decode /
  * feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing is real — schema, partition-parallel batch
  * processing via `mapPartitions` on a typed Dataset (the JVM analogue of
  * `mapInPandas` batches: one decoder instantiation per partition, rows
  * streamed through it), deterministic outputs. The codec itself is a
  * clearly-marked STUB (no image/audio libraries ship in this sandbox):
  * payloads carry a 16-byte GRFT header (magic, kind, width, height,
  * channels/frames) followed by deterministic content bytes, and "decoding"
  * parses that header. Swapping in a real codec changes only
  * [[StubCodec.decode]] — every operator signature and the physical plan
  * shape stay fixed.
  */
final case class Asset(asset_id: Long, kind: String, bytes: Array[Byte])
final case class AssetMeta(asset_id: Long, kind: String, width: Int,
                           height: Int, channels: Int, frames: Int,
                           byte_len: Int)
final case class AssetFeature(asset_id: Long, kind: String,
                              histogram: Array[Double])

object StubCodec {
  val Magic: Int = 0x47524654 // "GRFT"

  final case class Decoded(kind: String, width: Int, height: Int,
                           channels: Int, frames: Int, body: Array[Byte])

  def encode(kind: String, width: Int, height: Int, channels: Int,
             frames: Int, body: Array[Byte]): Array[Byte] = {
    // layout: magic:4 kind:1 pad:1 width:2 height:2 channels:2 frames:4 = 16
    val buf = ByteBuffer.allocate(16 + body.length).order(ByteOrder.BIG_ENDIAN)
    buf.putInt(Magic)
    buf.put(kindCode(kind)).put(0.toByte)
    buf.putShort(width.toShort).putShort(height.toShort)
    buf.putShort(channels.toShort)
    buf.putInt(frames)
    buf.put(body)
    buf.array()
  }

  private def kindCode(kind: String): Byte = kind match {
    case "image" => 1; case "audio" => 2; case "video" => 3; case _ => 0
  }
  private def codeKind(b: Byte): String = b match {
    case 1 => "image"; case 2 => "audio"; case 3 => "video"; case _ => "unknown"
  }

  /** STUB decode — parses the GRFT header; a real build would call an
    * image/audio codec here (and ONLY here). Malformed input → None,
    * mirroring the reference's swallow-and-sentinel error policy
    * (/root/reference/code/utils.py:5-16, SURVEY.md §2.11.6). */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null || bytes.length < 16) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    if (buf.getInt() != Magic) return None
    val kind = codeKind(buf.get())
    buf.get() // pad
    val width = buf.getShort() & 0xffff
    val height = buf.getShort() & 0xffff
    val channels = buf.getShort().toInt
    val frames = buf.getInt()
    Some(Decoded(kind, width, height, channels, frames,
      java.util.Arrays.copyOfRange(bytes, 16, bytes.length)))
  }
}

object Assets {
  import graft.core.Hashing.{bounded, h}

  /** Deterministic synthetic asset table (seeded, pure function of idx —
    * no Random/wall-clock; byte-identical across runs and parallelism). */
  def generate(spark: SparkSession, n: Int, seed: Long = 42L,
               partitions: Int = 8): Dataset[Asset] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { idx =>
      val kind = bounded(h(seed, idx.toInt, 0), 3) match {
        case 0 => "image"; case 1 => "audio"; case 2 => "video"
      }
      val (w, ht, ch, fr) = kind match {
        case "image" => (32 + bounded(h(seed, idx.toInt, 1), 32) * 16,
          32 + bounded(h(seed, idx.toInt, 2), 32) * 16, 3, 1)
        case "audio" => (0, 0, 1 + bounded(h(seed, idx.toInt, 3), 2),
          100 + bounded(h(seed, idx.toInt, 4), 900))
        case "video" => (64, 48, 3, 8 + bounded(h(seed, idx.toInt, 5), 24))
      }
      val bodyLen = 64 + bounded(h(seed, idx.toInt, 6), 192)
      val body = Array.tabulate[Byte](bodyLen)(i =>
        (h(seed, idx.toInt, 7, i) & 0xff).toByte)
      Asset(idx, kind, StubCodec.encode(kind, w, ht, ch, fr, body))
    }
  }

  /** Decode metadata for every asset — partition-parallel, one pass,
    * malformed rows dropped (never task failure). */
  def decodeMeta(assets: Dataset[Asset]): Dataset[AssetMeta] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        StubCodec.decode(a.bytes).map(d =>
          AssetMeta(a.asset_id, d.kind, d.width, d.height, d.channels,
            d.frames, a.bytes.length))
      }
    }
  }

  /** Byte-histogram feature (16 bins over the payload body) — the stub
    * stand-in for an embedding/feature extractor; batch shape identical. */
  def features(assets: Dataset[Asset]): Dataset[AssetFeature] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        StubCodec.decode(a.bytes).map { d =>
          val hist = new Array[Double](16)
          var i = 0
          while (i < d.body.length) { hist((d.body(i) & 0xff) >> 4) += 1; i += 1 }
          val n = math.max(1, d.body.length).toDouble
          AssetFeature(a.asset_id, d.kind, hist.map(_ / n))
        }
      }
    }
  }

  /** STUB resize: re-encodes image headers at (w, h), body truncated or
    * cycled deterministically to w*h*channels/64 bytes. */
  def resize(assets: Dataset[Asset], w: Int, h0: Int): Dataset[Asset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        StubCodec.decode(a.bytes) match {
          case Some(d) if d.kind == "image" =>
            val outLen = math.max(1, w * h0 * d.channels / 64)
            val body = Array.tabulate[Byte](outLen)(i => d.body(i % d.body.length))
            a.copy(bytes = StubCodec.encode("image", w, h0, d.channels, 1, body))
          case _ => a
        }
      }
    }
  }

  /** Frame sampling for video assets: every `stride`-th frame index as a
    * (asset_id, frame_idx, frame_bytes) table — explode-shaped output. */
  def sampleFrames(assets: Dataset[Asset], stride: Int): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        StubCodec.decode(a.bytes) match {
          case Some(d) if d.kind == "video" && d.frames > 0 =>
            val per = math.max(1, d.body.length / d.frames)
            (0 until d.frames by stride).iterator.map { f =>
              val from = math.min(f * per, d.body.length)
              val until = math.min(from + per, d.body.length)
              (a.asset_id, f, java.util.Arrays.copyOfRange(d.body, from, until))
            }
          case _ => Iterator.empty
        }
      }
    }.toDF("asset_id", "frame_idx", "frame_bytes")
  }
}
