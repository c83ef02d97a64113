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
  * streamed through it), deterministic outputs. Decoding is REAL for the
  * standard formats that are pure header/byte parsing — PPM (P6), BMP
  * (uncompressed), WAV (RIFF/PCM) — see [[Codecs]]; only compressed VIDEO
  * remains behind the clearly-marked GRFT stub container ([[StubCodec]]:
  * a 16-byte header + deterministic content bytes), since real video
  * codecs need libraries this sandbox doesn't ship. Swapping one in
  * changes only the [[Codecs.decode]] dispatch — every operator signature
  * and the physical plan shape stay fixed.
  */
final case class Asset(asset_id: Long, kind: String, bytes: Array[Byte])
final case class AssetMeta(asset_id: Long, kind: String, format: String,
                           width: Int, height: Int, channels: Int,
                           frames: Int, byte_len: Int)
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

  /** Engine-portable SHAPE hash (the d4/e2/e3 oracle recipe): first 8
    * digest bytes of md5("seed_i_k") as a big-endian signed long — DuckDB
    * rebuilds it from the hex prefix with the two's-complement hi/lo
    * split, so every shape decision (kind, dims, frame/body counts) a
    * generator built on it makes is mirrorable in pure SQL. Payload BYTES
    * stay on SplitMix (they never reach the m1 aggregate). */
  def md5Shape(seed: Long, i: Long, k: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${seed}_${i}_$k".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  /** Deterministic synthetic asset table (seeded, pure function of idx —
    * no Random/wall-clock; byte-identical across runs and parallelism).
    * Images alternate REAL containers (PPM / BMP), audio is REAL WAV
    * (PCM16); video uses the GRFT stub container. `shapeHash` picks the
    * shape-parameter hash family: SplitMix (default, MultimodalSpec
    * goldens) or the portable [[md5Shape]] (the m1 oracle tier). */
  def generate(spark: SparkSession, n: Int, seed: Long = 42L,
               partitions: Int = 8,
               shapeHash: (Long, Long, Long) => Long =
                 (s, i, k) => h(s, i, k)): Dataset[Asset] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { idx =>
      val i = idx.toInt
      bounded(shapeHash(seed, i, 0), 3) match {
        case 0 => // image: PPM for even hashes, BMP (row-padded) otherwise
          val w = 4 + bounded(shapeHash(seed, i, 1), 8) * 4
          val ht = 3 + bounded(shapeHash(seed, i, 2), 10)
          if (bounded(shapeHash(seed, i, 8), 2) == 0) {
            val rgb = Array.tabulate[Byte](w * ht * 3)(p =>
              (h(seed, i, 7, p) & 0xff).toByte)
            Asset(idx, "image", Codecs.encodePpm(w, ht, rgb))
          } else {
            val rowBytes = (w * 3 + 3) / 4 * 4
            val bgr = Array.tabulate[Byte](rowBytes * ht)(p =>
              (h(seed, i, 7, p) & 0xff).toByte)
            Asset(idx, "image", Codecs.encodeBmp(w, ht, bgr))
          }
        case 1 => // audio: PCM16 WAV
          val ch = 1 + bounded(shapeHash(seed, i, 3), 2)
          val frames = 100 + bounded(shapeHash(seed, i, 4), 900)
          val samples = Array.tabulate[Short](frames * ch)(p =>
            (h(seed, i, 7, p) & 0xffff).toShort)
          Asset(idx, "audio", Codecs.encodeWav(ch, 8000, samples))
        case 2 => // video: GRFT stub container (real codecs need libs)
          val fr = 8 + bounded(shapeHash(seed, i, 5), 24)
          val bodyLen = 64 + bounded(shapeHash(seed, i, 6), 192)
          val body = Array.tabulate[Byte](bodyLen)(p =>
            (h(seed, i, 7, p) & 0xff).toByte)
          Asset(idx, "video", StubCodec.encode("video", 64, 48, 3, fr, body))
      }
    }
  }

  /** Decode metadata for every asset — partition-parallel, one pass,
    * malformed rows dropped (never task failure). Real parsing for
    * PPM/BMP/WAV; GRFT header parsing for the stub tier. */
  def decodeMeta(assets: Dataset[Asset]): Dataset[AssetMeta] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        Codecs.decode(a.bytes).map(d =>
          AssetMeta(a.asset_id, d.kind, d.format, d.width, d.height,
            d.channels, d.frames, a.bytes.length))
      }
    }
  }

  /** Byte-histogram feature (16 bins over the decoded pixel/sample
    * payload) — a real signal for the real containers; batch shape
    * identical to an embedding extractor's. */
  def features(assets: Dataset[Asset]): Dataset[AssetFeature] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        Codecs.decode(a.bytes).map { d =>
          val hist = new Array[Double](16)
          var i = 0
          while (i < d.body.length) { hist((d.body(i) & 0xff) >> 4) += 1; i += 1 }
          val n = math.max(1, d.body.length).toDouble
          AssetFeature(a.asset_id, d.kind, hist.map(_ / n))
        }
      }
    }
  }

  /** Image resize: REAL nearest-neighbor resample of the decoded pixel
    * array, re-encoded as PPM (the normalization target for downstream
    * training pipelines). Non-images pass through unchanged. */
  def resize(assets: Dataset[Asset], w: Int, h0: Int): Dataset[Asset] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        Codecs.decode(a.bytes) match {
          case Some(d) if d.kind == "image" =>
            a.copy(bytes = Codecs.resizeToPpm(d, w, h0))
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
        Codecs.decode(a.bytes) match {
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
