package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** REAL pure-JVM decoders for standard multimodal formats — PPM (P6),
  * BMP (uncompressed 24/32bpp), and WAV (RIFF/PCM) are header + raw-byte
  * parsing only, so no external codec library is needed and the decode
  * stage of the multimodal pipeline is genuine for images and audio. The
  * GRFT container ([[StubCodec]]) remains the clearly-marked stub tier for
  * formats that truly need codec libraries (compressed video).
  *
  * All parsers follow the engine's swallow-and-sentinel policy
  * (SURVEY.md §2.11.6): malformed input → None, never a task failure.
  */
object Codecs {

  /** Uniform decoded view: kind ∈ {image, audio, video}, `format` names
    * the container (ppm/bmp/wav/grft), `body` is the raw sample/pixel
    * payload (pixels for images, PCM bytes for audio). */
  final case class Decoded(kind: String, format: String, width: Int,
                           height: Int, channels: Int, frames: Int,
                           body: Array[Byte])

  /** Sniff the container by magic and dispatch. */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null || bytes.length < 4) return None
    if (bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
    else if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F') decodeWav(bytes)
    else StubCodec.decode(bytes).map(d =>
      Decoded(d.kind, "grft", d.width, d.height, d.channels, d.frames, d.body))
  }

  // ---- PPM (P6) --------------------------------------------------------

  def encodePpm(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb length must be w*h*3")
    val header = s"P6\n$width $height\n255\n".getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** P6 parser: "P6" ws width ws height ws maxval single-ws, then raw RGB.
    * Handles '#' comments in the header per the netpbm spec. */
  def decodePpm(bytes: Array[Byte]): Option[Decoded] = try {
    var i = 2 // past "P6"
    def skipWs(): Unit = {
      var in = true
      while (in && i < bytes.length) {
        val c = bytes(i).toChar
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else in = false
      }
    }
    def int(): Int = {
      skipWs()
      var v = 0; var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1; any = true
      }
      if (!any) throw new IllegalArgumentException("ppm: no int")
      v
    }
    val w = int(); val h = int(); val maxv = int()
    i += 1 // exactly one whitespace after maxval
    if (w <= 0 || h <= 0 || maxv != 255) return None
    if (bytes.length - i < w * h * 3) return None
    Some(Decoded("image", "ppm", w, h, 3, 1,
      java.util.Arrays.copyOfRange(bytes, i, i + w * h * 3)))
  } catch { case _: Exception => None }

  /** REAL nearest-neighbor resize over a decoded RGB image → PPM bytes.
    * Short bodies (the GRFT stub's synthetic images) index modulo the body
    * so the operator stays total. */
  def resizeToPpm(d: Decoded, w2: Int, h2: Int): Array[Byte] = {
    val ch = math.max(1, d.channels)
    val out = new Array[Byte](w2 * h2 * 3)
    val bl = math.max(1, d.body.length)
    var y = 0
    while (y < h2) {
      val sy = if (d.height > 0) y * d.height / h2 else 0
      var x = 0
      while (x < w2) {
        val sx = if (d.width > 0) x * d.width / w2 else 0
        val src = (sy.toLong * d.width + sx) * ch
        var c = 0
        while (c < 3) {
          out((y * w2 + x) * 3 + c) =
            d.body(((src + math.min(c, ch - 1)) % bl).toInt)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    encodePpm(w2, h2, out)
  }

  // ---- BMP (uncompressed 24/32 bpp) ------------------------------------

  /** Normalizes the pixel block to the same layout PPM uses — top-down,
    * unpadded, RGB(A) channel order — so [[resizeToPpm]] and histogram
    * consumers can treat every decoded image identically. BMP stores rows
    * bottom-up (positive height), 4-byte-padded, in BGR(A) order. */
  def decodeBmp(bytes: Array[Byte]): Option[Decoded] = try {
    if (bytes.length < 54) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val height = math.abs(rawHeight)
    val topDown = rawHeight < 0
    val bpp = buf.getShort(28) & 0xffff
    val compression = buf.getInt(30)
    if (width <= 0 || height <= 0 || compression != 0 ||
      (bpp != 24 && bpp != 32)) return None
    val ch = bpp / 8
    val rowBytes = (width * ch + 3) / 4 * 4 // rows pad to 4-byte boundaries
    if (dataOffset < 54 || dataOffset.toLong + rowBytes.toLong * height > bytes.length)
      return None
    val out = new Array[Byte](width * height * ch)
    var y = 0
    while (y < height) {
      val srcRow = dataOffset + (if (topDown) y else height - 1 - y) * rowBytes
      var x = 0
      while (x < width) {
        val s = srcRow + x * ch
        val d = (y * width + x) * ch
        out(d) = bytes(s + 2)     // R ← B slot
        out(d + 1) = bytes(s + 1) // G
        out(d + 2) = bytes(s)     // B ← R slot
        if (ch == 4) out(d + 3) = bytes(s + 3) // A
        x += 1
      }
      y += 1
    }
    Some(Decoded("image", "bmp", width, height, ch, 1, out))
  } catch { case _: Exception => None }

  def encodeBmp(width: Int, height: Int, bgr: Array[Byte]): Array[Byte] = {
    val rowBytes = (width * 3 + 3) / 4 * 4
    require(bgr.length == rowBytes * height, "bgr must be row-padded")
    val buf = ByteBuffer.allocate(54 + bgr.length).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + bgr.length).putInt(0).putInt(54) // size, reserved, offset
    buf.putInt(40).putInt(width).putInt(height)      // BITMAPINFOHEADER
    buf.putShort(1).putShort(24)                     // planes, bpp
    buf.putInt(0).putInt(bgr.length)                 // BI_RGB, image size
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0) // 72dpi, palette
    buf.put(bgr)
    buf.array()
  }

  // ---- WAV (RIFF / PCM) ------------------------------------------------

  def decodeWav(bytes: Array[Byte]): Option[Decoded] = try {
    if (bytes.length < 44) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' ||
      bytes(11) != 'E') return None
    var i = 12
    var channels = 0; var bitsPerSample = 0; var sampleRate = 0
    var data: Array[Byte] = null
    while (i + 8 <= bytes.length) {
      val id = new String(bytes, i, 4, StandardCharsets.US_ASCII)
      val size = buf.getInt(i + 4)
      if (size < 0 || i + 8 + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (buf.getShort(i + 8) != 1) return None // PCM only
          channels = buf.getShort(i + 10) & 0xffff
          sampleRate = buf.getInt(i + 12)
          bitsPerSample = buf.getShort(i + 22) & 0xffff
        case "data" =>
          data = java.util.Arrays.copyOfRange(bytes, i + 8, i + 8 + size)
        case _ => () // skip unknown chunks
      }
      i += 8 + size + (size & 1) // chunks pad to even sizes
    }
    if (channels <= 0 || bitsPerSample <= 0 || data == null) return None
    val frames = data.length / (channels * (bitsPerSample / 8))
    // width carries the sample rate (audio has no spatial dims)
    Some(Decoded("audio", "wav", sampleRate, 0, channels, frames, data))
  } catch { case _: Exception => None }

  def encodeWav(channels: Int, sampleRate: Int,
                samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataLen)
    buf.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    buf.put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
    buf.putShort(1).putShort(channels.toShort) // PCM
    buf.putInt(sampleRate).putInt(sampleRate * channels * 2)
    buf.putShort((channels * 2).toShort).putShort(16)
    buf.put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }
}
