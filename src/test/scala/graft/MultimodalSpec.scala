package graft

import graft.pipeline.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("fromText builds binary media rows with metadata struct") {
    val docs = Seq((1L, "hello world", "srcA"), (2L, "abc", "srcB"))
      .toDF("doc_id", "text", "source")
    val media = Multimodal.fromText(docs, "doc_id", "text", "source")
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "content", "meta"))
    val r = media.orderBy("media_id").collect()
    assert(r(0).getAs[Array[Byte]]("content").toSeq == "hello world".getBytes("UTF-8").toSeq)
    assert(r(1).getStruct(2).getAs[Long]("n_bytes") == 3L)
  }

  test("extractFeatures is deterministic and distributed") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = Seq((1L, "hello world", "srcA"), (2L, "abc", "srcB"))
      .toDF("doc_id", "text", "source")
    val media = Multimodal.fromText(docs, "doc_id", "text", "source").repartition(4)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    assert(f1(0).n_bytes == 11L && f1(0).feature.length == 8)
    assert(f1(0).width >= 16 && f1(0).height >= 16)
  }

  test("real BMP decode: dims + color stats from a hand-built 24bpp image") {
    // 2x1 BMP: one pure-red, one pure-blue pixel (BGR order, row padded to 4)
    val bb = java.nio.ByteBuffer.allocate(62).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(62).putInt(0).putInt(54)
    bb.putInt(40).putInt(2).putInt(1).putShort(1).putShort(24)
    bb.putInt(0).putInt(8).putInt(2835).putInt(2835).putInt(0).putInt(0)
    bb.put(Array[Byte](0, 0, -1)) // red pixel  (B=0,   G=0, R=255)
    bb.put(Array[Byte](-1, 0, 0)) // blue pixel (B=255, G=0, R=0)
    bb.put(Array[Byte](0, 0))     // row pad
    val Some((w, h, feat)) = graft.pipeline.Multimodal.decodeBmp(bb.array())
    assert(w == 2 && h == 1)
    assert(math.abs(feat(0) - 0.5f) < 1e-6 && feat(1) == 0f &&
      math.abs(feat(2) - 0.5f) < 1e-6)
    // red lum 0.299 -> bin 1; blue lum 0.114 -> bin 0
    assert(feat(3) == 0.5f && feat(4) == 0.5f && feat(5) == 0f)
    // and the dispatching decoder routes it to the real parser
    val (_, dw, dh, dfeat) = graft.pipeline.Multimodal.decode(bb.array())
    assert(dw == 2 && dh == 1 && dfeat.sameElements(feat))
  }

  test("real PNG decode via the JDK's ImageIO: lossless dims + color stats") {
    // 3x2 image: top row red/green/blue, bottom row black/white/gray(128)
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000); img.setRGB(1, 0, 0x00ff00); img.setRGB(2, 0, 0x0000ff)
    img.setRGB(0, 1, 0x000000); img.setRGB(1, 1, 0xffffff); img.setRGB(2, 1, 0x808080)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    val bytes = out.toByteArray
    val Some((w, h, feat)) = graft.pipeline.Multimodal.decodeImage(bytes)
    assert(w == 3 && h == 2)
    // PNG is lossless: means are exact fractions of 255
    val exp = (255.0 + 0 + 0 + 0 + 255 + 128) / 6 / 255.0
    assert(math.abs(feat(0) - exp) < 1e-6, feat.mkString(","))
    assert(math.abs(feat(1) - exp) < 1e-6 && math.abs(feat(2) - exp) < 1e-6)
    // and the dispatcher routes PNG to the real decoder, not the stub
    val (_, dw, dh, dfeat) = graft.pipeline.Multimodal.decode(bytes)
    assert(dw == 3 && dh == 2 && dfeat.sameElements(feat))
  }

  test("real JPEG decode via the JDK's ImageIO: dims exact, stats near-lossless") {
    val img = new java.awt.image.BufferedImage(16, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 16) img.setRGB(x, y, 0x406080)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out))
    val bytes = out.toByteArray
    val Some((w, h, feat)) = graft.pipeline.Multimodal.decodeImage(bytes)
    assert(w == 16 && h == 8)
    // JPEG is lossy: flat-color image decodes within a few 8-bit steps
    assert(math.abs(feat(0) - 0x40 / 255.0) < 0.03, feat.mkString(","))
    assert(math.abs(feat(1) - 0x60 / 255.0) < 0.03)
    assert(math.abs(feat(2) - 0x80 / 255.0) < 0.03)
  }

  test("non-media bytes do not reach ImageIO: stub keeps pseudo-features") {
    val junk = "just some text bytes, not an image".getBytes("UTF-8")
    assert(graft.pipeline.Multimodal.decodeImage(junk).isEmpty)
    val (cs, w, h, feat) = graft.pipeline.Multimodal.decode(junk)
    val (cs2, w2, h2, feat2) = graft.pipeline.Multimodal.decodeStub(junk)
    assert(cs == cs2 && w == w2 && h == h2 && feat.sameElements(feat2))
  }

  test("real WAV decode: PCM-16 channel/rate + RMS envelope") {
    val n = 8
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(2 * n)
    (1 to n).foreach(_ => bb.putShort(16384)) // constant half-scale signal
    val Some((ch, rate, env)) = graft.pipeline.Multimodal.decodeWav(bb.array())
    assert(ch == 1 && rate == 8000)
    env.foreach(v => assert(math.abs(v - 0.5f) < 1e-4, s"env $v"))
    // non-PCM / truncated bytes fall back to the stub, never throw
    assert(graft.pipeline.Multimodal.decodeWav("RIFFxxxxWAVE".getBytes).isEmpty)
    val (_, _, _, f) = graft.pipeline.Multimodal.decode("not media".getBytes)
    assert(f.length == 8)
  }

  test("real AIFF and AU decode via javax.sound: channel/rate + RMS envelope") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // constant half-scale mono PCM-16 at 8 kHz, containered by the JDK
    // itself — the decoder must agree with the hand-parsed WAV path on
    // the identical samples
    val n = 64
    val pcmBE = java.nio.ByteBuffer.allocate(2 * n).order(java.nio.ByteOrder.BIG_ENDIAN)
    (1 to n).foreach(_ => pcmBE.putShort(16384))
    def container(t: AudioFileFormat.Type, bigEndian: Boolean): Array[Byte] = {
      val fmt = new AudioFormat(8000f, 16, 1, true, bigEndian)
      val in = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcmBE.array()), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(in, t, out)
      out.toByteArray
    }
    for ((name, bytes) <- Seq(
        "AIFF" -> container(AudioFileFormat.Type.AIFF, bigEndian = true),
        "AU" -> container(AudioFileFormat.Type.AU, bigEndian = true))) {
      val dec = graft.pipeline.Multimodal.decodeAudio(bytes)
      assert(dec.nonEmpty, s"$name did not decode")
      val Some((ch, rate, env)) = dec
      assert(ch == 1 && rate == 8000, s"$name meta ($ch, $rate)")
      env.foreach(v => assert(math.abs(v - 0.5f) < 1e-4, s"$name env $v"))
      // the dispatcher routes these to the real decoder, not the stub
      val (_, w, h, feat) = graft.pipeline.Multimodal.decode(bytes)
      assert(w == 1 && h == 8000 && feat.length == 8)
    }
    // junk with the right magic falls through to None, never throws
    assert(graft.pipeline.Multimodal.decodeAudio("FORMxxxxAIFFjunk".getBytes).isEmpty)
    assert(graft.pipeline.Multimodal.decodeAudio(".sndjunkjunkjunk".getBytes).isEmpty)
  }

  test("sampleFrames emits per-frame rows") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val docs = Seq((1L, "0123456789abcdef0123456789abcdef", "v")).toDF("doc_id", "text", "source")
    val frames = Multimodal.sampleFrames(
      Multimodal.fromText(docs, "doc_id", "text", "source"), frames = 4).collect()
    assert(frames.length == 4)
    assert(frames.map(_.getAs[Int]("frame")).sorted.toSeq == Seq(0, 1, 2, 3))
  }
}
