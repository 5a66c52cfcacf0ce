package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media is carried as an opaque `binary` column plus a typed metadata
  * struct — the layout a 100 TB training pipeline uses (content-addressed
  * blobs in parquet, decoded lazily per partition). Decode dispatches on
  * the magic bytes: the uncompressed formats a bare JVM can parse are REAL
  * (24-bit BMP → dims + color stats, PCM-16 WAV → channel/rate + RMS
  * envelope; MultimodalSpec decodes hand-built fixtures of both), while
  * compressed formats (JPEG/PNG/MP3/H.264 — codec libs absent from this
  * container) fall to `decodeStub`'s deterministic pseudo-features. The
  * Spark-side plumbing (schema, batching, partition iteration, feature
  * schema) is real either way.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", LongType),
      StructField("source", StringType))), nullable = true)))

  final case class MediaFeatures(
      media_id: Long, n_bytes: Long, checksum: Long,
      width: Int, height: Int, feature: Array[Float])

  /** Wrap a text table as fake media rows (UTF-8 bytes as the blob). */
  def fromText(docs: DataFrame, idCol: String, textCol: String,
               sourceCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("content"),
      struct(lit("text/plain").as("format"),
        length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
        col(sourceCol).as("source")).as("meta"))

  /** STUB decoder: a real pipeline would decode image bytes (JPEG/PNG) here;
    * we derive deterministic pseudo-features so the distributed plumbing is
    * testable. Runs per-partition over the iterator — the shape a native
    * decoder (or an Arrow-batched python worker) plugs into. */
  def decodeStub(bytes: Array[Byte]): (Long, Int, Int, Array[Float]) = {
    val cs = checksum(bytes)
    val w = 16 + (math.abs(cs) % 1024).toInt
    val h = 16 + (math.abs(cs / 1024) % 1024).toInt
    val feat = Array.tabulate(8)(j => ((cs >> (j * 8)) & 0xff).toFloat / 255f)
    (cs, w, h, feat)
  }

  private def checksum(bytes: Array[Byte]): Long = {
    var cs = 1125899906842597L // deterministic FNV-ish rolling checksum
    var i = 0
    while (i < bytes.length) { cs = cs * 31 + bytes(i); i += 1 }
    cs
  }

  /** REAL decoder for uncompressed 24-bit BI_RGB BMP (pure JVM — no codec
    * libs needed for the uncompressed formats): (width, height,
    * [meanR, meanG, meanB, 5-bin luminance histogram]). None when the
    * bytes are not such a BMP — compressed formats stay with the stub. */
  def decodeBmp(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val pixelOff = bb.getInt(10)
    val width = bb.getInt(18)
    val rawH = bb.getInt(22)
    val bpp = bb.getShort(28) & 0xffff
    val compression = bb.getInt(30)
    val height = math.abs(rawH)
    if (width <= 0 || height == 0 || bpp != 24 || compression != 0) return None
    val rowBytes = (width * 3 + 3) / 4 * 4
    if (pixelOff.toLong + rowBytes.toLong * height > bytes.length) return None
    var (sr, sg, sb) = (0.0, 0.0, 0.0)
    val hist = new Array[Long](5)
    var y = 0
    while (y < height) {
      var x = 0
      val row = pixelOff + y * rowBytes
      while (x < width) {
        val b = bytes(row + x * 3) & 0xff
        val g = bytes(row + x * 3 + 1) & 0xff
        val r = bytes(row + x * 3 + 2) & 0xff
        sr += r; sg += g; sb += b
        val lum = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
        hist(math.min((lum * 5).toInt, 4)) += 1
        x += 1
      }
      y += 1
    }
    val n = width.toLong * height
    Some((width, height, Array(
      (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat, (sb / n / 255.0).toFloat,
      hist(0).toFloat / n, hist(1).toFloat / n, hist(2).toFloat / n,
      hist(3).toFloat / n, hist(4).toFloat / n)))
  }

  /** REAL decoder for PCM-16 WAV (RIFF/WAVE, fmt tag 1): (channels,
    * sampleRate, 8-segment RMS envelope of channel 0, full-scale
    * normalized). None for anything else (compressed audio stays with the
    * stub). */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    if (bytes.length < 44 ||
      new String(bytes, 0, 4, "US-ASCII") != "RIFF" ||
      new String(bytes, 8, 4, "US-ASCII") != "WAVE") return None
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var off = 12
    var fmt = Option.empty[(Int, Int, Int)] // (channels, sampleRate, bits)
    var data = Option.empty[(Int, Int)]     // (offset, size)
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(bytes, off, 4, "US-ASCII")
      val size = bb.getInt(off + 4)
      if (size < 0 || off + 8 + size > bytes.length) return None
      if (id == "fmt " && size >= 16) {
        val audioFormat = bb.getShort(off + 8) & 0xffff
        if (audioFormat != 1) return None // PCM only
        fmt = Some((bb.getShort(off + 10) & 0xffff, bb.getInt(off + 12),
          bb.getShort(off + 22) & 0xffff))
      } else if (id == "data") data = Some((off + 8, size))
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    for ((channels, rate, bits) <- fmt; (dOff, dSize) <- data;
         if bits == 16 && channels > 0) yield {
      val frame = 2 * channels
      val nFrames = dSize / frame
      val env = new Array[Float](8)
      if (nFrames > 0) {
        val seg = math.max(1, nFrames / 8)
        var s = 0
        while (s < 8) {
          var acc = 0.0
          var i = s * seg
          val end = math.min(if (s == 7) nFrames else (s + 1) * seg, nFrames)
          while (i < end) { // channel 0 of each frame
            val v = bb.getShort(dOff + i * frame) / 32768.0
            acc += v * v
            i += 1
          }
          env(s) = if (end > s * seg) math.sqrt(acc / (end - s * seg)).toFloat else 0f
          s += 1
        }
      }
      (channels, rate, env)
    }
  }

  /** REAL decoder for the JDK's built-in compressed image codecs
    * (JPEG/PNG/GIF via `javax.imageio` — part of java.desktop, shipped
    * with every JDK, headless-safe): same feature contract as
    * [[decodeBmp]] — (width, height, [meanR, meanG, meanB, 5-bin
    * luminance histogram]). Magic-byte sniffed first so arbitrary blobs
    * don't pay an ImageIO attempt; None for anything the JDK cannot
    * decode (MP3/H.264 stay with the stub — audio/video codecs genuinely
    * are not in the JVM). */
  def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    def magic = bytes.length >= 8 && (
      (bytes(0) == 0xff.toByte && bytes(1) == 0xd8.toByte) || // JPEG SOI
      (bytes(0) == 0x89.toByte && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') ||
      (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F'))
    if (!magic) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) return None
    val (w, h) = (img.getWidth, img.getHeight)
    var (sr, sg, sb) = (0.0, 0.0, 0.0)
    val hist = new Array[Long](5)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        sr += r; sg += g; sb += b
        val lum = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
        hist(math.min((lum * 5).toInt, 4)) += 1
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    Some((w, h, Array(
      (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat, (sb / n / 255.0).toFloat,
      hist(0).toFloat / n, hist(1).toFloat / n, hist(2).toFloat / n,
      hist(3).toFloat / n, hist(4).toFloat / n)))
  }

  /** REAL decoder for the JDK's built-in audio container formats beyond
    * hand-parsed WAV: AIFF and AU/SND via `javax.sound.sampled`
    * (java.desktop, headless-safe). Same feature contract as
    * [[decodeWav]] — (channels, sampleRate, 8-segment RMS envelope of
    * channel 0). Magic-byte sniffed ('FORM'/'.snd') so arbitrary blobs
    * don't pay an AudioSystem attempt; PCM-16 only (the JDK parses other
    * widths but 16-bit is the shared contract with the WAV path). */
  def decodeAudio(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    def magic = bytes.length >= 12 && (
      (bytes(0) == 'F' && bytes(1) == 'O' && bytes(2) == 'R' && bytes(3) == 'M') || // AIFF
      (bytes(0) == '.' && bytes(1) == 's' && bytes(2) == 'n' && bytes(3) == 'd'))   // AU
    if (!magic) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        val enc = f.getEncoding
        if (f.getSampleSizeInBits != 16 || f.getChannels <= 0 ||
          (enc != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)) return None
        val pcm = in.readAllBytes()
        val channels = f.getChannels
        val frame = 2 * channels
        val nFrames = pcm.length / frame
        val bb = java.nio.ByteBuffer.wrap(pcm).order(
          if (f.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        val env = new Array[Float](8)
        if (nFrames > 0) {
          val seg = math.max(1, nFrames / 8)
          var s = 0
          while (s < 8) {
            var acc = 0.0
            var i = s * seg
            val end = math.min(if (s == 7) nFrames else (s + 1) * seg, nFrames)
            while (i < end) {
              val v = bb.getShort(i * frame) / 32768.0
              acc += v * v
              i += 1
            }
            env(s) = if (end > s * seg) math.sqrt(acc / (end - s * seg)).toFloat else 0f
            s += 1
          }
        }
        Some((channels, math.round(f.getSampleRate), env))
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Dispatching decoder: real parse for every format the JVM can decode
    * without external libraries — 24-bit BMP and PCM-16 WAV by hand,
    * JPEG/PNG/GIF through the JDK's own `javax.imageio`, AIFF/AU through
    * `javax.sound.sampled` — deterministic stub only for the codecs the
    * JVM genuinely lacks (MP3/AAC/H.264). Checksum is always the rolling
    * byte checksum, so content addressing is format-independent. */
  def decode(bytes: Array[Byte]): (Long, Int, Int, Array[Float]) =
    decodeBmp(bytes).orElse(decodeImage(bytes)).orElse(decodeWav(bytes))
      .orElse(decodeAudio(bytes)) match {
      case Some((w, h, feat)) => (checksum(bytes), w, h, feat)
      case None => decodeStub(bytes)
    }

  /** Distributed decode + feature extraction: mapPartitions so a real
    * decoder could amortize per-partition init (codec contexts, model
    * weights). Returns a typed Dataset with a stable feature schema. */
  def extractFeatures(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val b = if (bytes == null) Array.empty[Byte] else bytes
          val (cs, w, h, feat) = decode(b)
          MediaFeatures(id, b.length.toLong, cs, w, h, feat)
        }
      }
  }

  /** Frame-sampling stub for video-like blobs: split the byte stream into
    * `frames` fixed-width windows and emit one feature row per frame. */
  def sampleFrames(media: DataFrame, frames: Int)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val b = if (bytes == null) Array.empty[Byte] else bytes
        val step = math.max(1, b.length / math.max(frames, 1))
        (0 until math.min(frames, math.max(b.length / step, 1))).map { f =>
          val slice = b.slice(f * step, math.min((f + 1) * step, b.length))
          val (cs, w, h, _) = decode(slice)
          (id, f, slice.length, cs, w, h)
        }
      }
      .toDF("media_id", "frame", "frame_bytes", "checksum", "width", "height")
  }
}
