package graft

import graft.ops.Multimodal

/** The image-header parser against real encoder output: every (fmt, dims)
  * claim is cross-checked with the JDK's own ImageIO decode. */
class MultimodalSpec extends SparkFunSuite {

  private def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no JDK writer for $fmt")
    bos.toByteArray
  }

  test("PNG/JPEG/GIF headers parse to the dimensions ImageIO decodes") {
    for {
      fmt <- Seq("png", "jpg", "gif")
      (w, h) <- Seq((1, 1), (16, 23), (640, 480), (257, 129))
    } {
      val bytes = encode(fmt, w, h)
      val (gotFmt, gw, gh, frames) = Multimodal.parseImageHeader(bytes)
      val expFmt = if (fmt == "jpg") "jpeg" else fmt
      assert(gotFmt == expFmt, s"$fmt $w x $h -> $gotFmt")
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(ref.getWidth == w && ref.getHeight == h) // encoder sanity
      assert(gw == w && gh == h, s"$fmt: parsed $gw x $gh, expected $w x $h")
      assert(frames == 1)
    }
  }

  test("multi-frame GIF: frame count from image-descriptor walk") {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until 3).foreach { f =>
      val img = new java.awt.image.BufferedImage(20, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 10; x <- 0 until 20) img.setRGB(x, y, (f * 97 + x + y) & 0xffffff)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    val (fmt, w, h, frames) = Multimodal.parseImageHeader(bos.toByteArray)
    assert(fmt == "gif" && w == 20 && h == 10)
    assert(frames == 3, s"counted $frames frames")
  }

  test("JPEG 0xFF fill bytes between segments are skipped (spec-legal padding)") {
    val bytes = encode("jpg", 33, 21)
    // insert a padding 0xFF right after SOI — encoders may pad markers
    val padded = bytes.take(2) ++ Array(0xff.toByte) ++ bytes.drop(2)
    val (fmt, w, h, _) = Multimodal.parseImageHeader(padded)
    assert(fmt == "jpeg" && w == 33 && h == 21, s"got $fmt $w x $h")
    // truncated-after-EOI stream: SOI + EOI only -> jpeg with no dims, no throw
    assert(Multimodal.parseImageHeader(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)) ==
      ("jpeg", 0, 0, 0))
  }

  test("unknown bytes fall through safely") {
    assert(Multimodal.parseImageHeader(Array[Byte]()) == ("unknown", 0, 0, 0))
    assert(Multimodal.parseImageHeader("not an image at all".getBytes) == ("unknown", 0, 0, 0))
    // truncated PNG signature (magic only, no IHDR) stays unknown, no throw
    assert(Multimodal.parseImageHeader(Array[Byte](0x89.toByte, 'P', 'N', 'G'))._1 == "unknown")
  }

  test("gate pipeline: real PNG round-trip matches the doc_id dimension law; sha deterministic") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val meta = Multimodal.extractMeta(spark, docs).collect()
    assert(meta.length == docs.count())
    meta.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == "png")
      assert(r.getInt(2) == Multimodal.gateWidth(id) && r.getInt(3) == Multimodal.gateHeight(id))
      assert(r.getInt(4) == 1)
    }
    // full decode frame (with n_bytes/sha) is partitioning-invariant and
    // deterministic: the PNG encoder's byte stream is stable for fixed pixels
    val d1 = Multimodal.decodeMeta(spark, Multimodal.withImageBlob(docs)).collect()
    val d2 = Multimodal.decodeMeta(spark, Multimodal.withImageBlob(docs.repartition(7)))
      .collect()
    assert(d1.map(_.toSeq).toSeq == d2.map(_.toSeq).toSeq)
    d1.foreach(r => assert(r.getString(6).length == 64))
    assert(d1.map(_.getString(6)).distinct.length == d1.length) // distinct images
    // the blob column really is the parsed input: decode one blob driver-side
    val one = Multimodal.withImageBlob(docs).filter(col("doc_id") === 0L)
      .select("media").collect()(0).getAs[Array[Byte]](0)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(one))
    assert(ref.getWidth == Multimodal.gateWidth(0) && ref.getHeight == Multimodal.gateHeight(0))
  }

  test("WAV parser cross-checks against javax.sound; MP4 follows the box law") {
    // WAV: the JDK's own RIFF reader agrees with our chunk walk
    Seq(0L, 2L, 4L, 6L, 28L, 57L * 2).foreach { id =>
      val bytes = Multimodal.wavBytes(id)
      val (fmt, rate, ch, durMs, w, h) = Multimodal.parseAvHeader(bytes)
      assert(fmt == "wav" && w == 0 && h == 0)
      assert(rate == Multimodal.wavRate(id) && ch == Multimodal.wavChannels(id))
      assert(durMs == Multimodal.wavDurationMs(id))
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes))
      assert(aff.getFormat.getSampleRate.toInt == rate)
      assert(aff.getFormat.getChannels == ch)
      assert(aff.getFrameLength == rate * Multimodal.wavDurationMs(id) / 1000)
    }
    // MP4: mvhd/tkhd walk recovers the stated laws
    Seq(1L, 3L, 5L, 7L, 99L, 101L).foreach { id =>
      val (fmt, rate, ch, durMs, w, h) = Multimodal.parseAvHeader(Multimodal.mp4Bytes(id))
      assert(fmt == "mp4" && rate == 0 && ch == 0)
      assert(durMs == Multimodal.mp4DurationMs(id))
      assert(w == Multimodal.mp4Width(id) && h == Multimodal.mp4Height(id))
    }
    // fallthrough: unknown bytes, truncated RIFF, ftyp-only MP4 — no throw
    assert(Multimodal.parseAvHeader(Array[Byte](1, 2, 3))._1 == "unknown")
    assert(Multimodal.parseAvHeader("RIFF1234WAVE".getBytes)._1 == "wav")
    assert(Multimodal.parseAvHeader(Multimodal.mp4Bytes(1L).take(20))._1 == "mp4")
    assert(Multimodal.parseAvHeader(Multimodal.wavBytes(0L).take(30))._2 == 0)
    // corrupt sizes whose toInt is negative: walk must terminate, not stall
    val badWav = Multimodal.wavBytes(0L).clone()
    // first chunk at offset 12: overwrite its size with 0xFFFFFFF8
    badWav(16) = 0xf8.toByte; badWav(17) = 0xff.toByte
    badWav(18) = 0xff.toByte; badWav(19) = 0xff.toByte
    assert(Multimodal.parseAvHeader(badWav)._1 == "wav") // returns, rate-less
    val badMp4 = Multimodal.mp4Bytes(1L).clone()
    // first box size -> 0x80000010 (negative as Int): walk must bail cleanly
    badMp4(0) = 0x80.toByte; badMp4(1) = 0; badMp4(2) = 0; badMp4(3) = 0x10
    assert(Multimodal.parseAvHeader(badMp4)._1 == "mp4")
  }
}
