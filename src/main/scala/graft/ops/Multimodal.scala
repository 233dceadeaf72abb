package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline: media as opaque `binary` columns with typed
  * metadata extracted by a REAL decoder.
  *
  * `decodeBatch` parses actual container headers from the blob bytes —
  * PNG IHDR, JPEG SOFn (marker scan), GIF logical screen descriptor +
  * image-descriptor frame count — using nothing beyond the JDK, so the
  * decode stage is genuine byte-level work, not a stand-in. Deeper
  * feature extraction (pixel decode, resampling) would slot into the same
  * batched per-partition iterator; the JDK's ImageIO covers PNG/JPEG/GIF
  * there too (MultimodalSpec cross-checks this parser against
  * `ImageIO.read` dimensions).
  *
  * The gate feeds the pipeline generator-produced PNGs whose dimensions are
  * a pure function of doc_id, so the DuckDB oracle states the expected
  * decoded metadata literally while the Spark side round-trips real bytes:
  * encode (ImageIO) → binary column → header parse.
  */
object Multimodal {

  // gate-image dimension law (shared by withImageBlob and the oracle)
  private[graft] def gateWidth(docId: Long): Int = 16 + (docId % 17).toInt
  private[graft] def gateHeight(docId: Long): Int = 16 + (docId % 23).toInt

  /** Deterministic real PNG bytes: a gateWidth×gateHeight RGB image whose
    * pixels are a function of (doc_id, x, y) — the same
    * `(docId * 2654435761 + 31x + y) & 0xffffff` law the BufferedImage
    * form wrote via setRGB. Encoded DIRECTLY (signature + IHDR + one
    * deflated IDAT + IEND, real zlib + CRC32): ImageIO.write's plugin
    * machinery (writer lookup, ImageOutputStream, per-scanline filtering)
    * cost ~0.2 ms per tiny image and dominated the gate's generation side;
    * the output is still a spec-valid PNG — MultimodalSpec ImageIO-decodes
    * it and cross-checks the dimensions. */
  private[graft] def pngBytes(docId: Long): Array[Byte] = {
    val w = gateWidth(docId); val h = gateHeight(docId)
    // raw scanlines: PNG filter byte 0 + RGB triples
    val raw = new Array[Byte](h * (1 + 3 * w))
    var y = 0
    var p = 0
    while (y < h) {
      raw(p) = 0; p += 1
      var x = 0
      while (x < w) {
        val v = (docId * 2654435761L + x * 31 + y).toInt & 0xffffff
        raw(p) = (v >> 16).toByte
        raw(p + 1) = ((v >> 8) & 0xff).toByte
        raw(p + 2) = (v & 0xff).toByte
        p += 3
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val comp = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val o = new java.io.ByteArrayOutputStream(comp.size + 64)
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).foreach(o.write)
    def chunk(typ: String, body: Array[Byte]): Unit = {
      be32w(o, body.length)
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(body)
      o.write(t, 0, t.length)
      o.write(body, 0, body.length)
      be32w(o, crc.getValue.toInt)
    }
    val ihdr = new java.io.ByteArrayOutputStream(13)
    be32w(ihdr, w); be32w(ihdr, h)
    ihdr.write(8); ihdr.write(2); ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    o.toByteArray
  }

  /** documents + a real PNG `media` binary column (the gate's image corpus). */
  def withImageBlob(documents: DataFrame): DataFrame = {
    val gen = udf((id: Long) => pngBytes(id))
    documents.select(col("doc_id"), gen(col("doc_id")).as("media"),
      lit("image/png").as("mime"))
  }

  final case class MediaMeta(doc_id: Long, fmt: String, width: Int, height: Int,
                             frames: Int, n_bytes: Int, sha: String)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** (fmt, width, height, frames) from real container headers; ("unknown",
    * 0, 0, 0) when no known magic matches. Pure function of the bytes. */
  private[graft] def parseImageHeader(b: Array[Byte]): (String, Int, Int, Int) = {
    if (b.length >= 24 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
      // PNG: 8-byte signature, IHDR chunk first: len(4) 'IHDR' w(4 BE) h(4 BE)
      ("png", be32(b, 16), be32(b, 20), 1)
    } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // JPEG: scan marker segments for SOFn (C0..CF except C4 DHT, C8 JPG,
      // CC DAC): precision(1) height(2 BE) width(2 BE)
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return ("jpeg", 0, 0, 0) // corrupt stream
        val marker = b(i + 1) & 0xff
        if (marker == 0xff) {
          i += 1 // 0xFF fill/padding byte before the real marker (spec-legal)
        } else if (marker == 0xd9) {
          return ("jpeg", 0, 0, 0) // EOI before any SOF: no dimensions
        } else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
          i += 2 // standalone marker, no length field
        } else if (marker >= 0xc0 && marker <= 0xcf &&
                   marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (i + 8 < b.length) return ("jpeg", be16(b, i + 7), be16(b, i + 5), 1)
          return ("jpeg", 0, 0, 0)
        } else {
          i += 2 + be16(b, i + 2) // skip segment: length includes itself
        }
      }
      ("jpeg", 0, 0, 0)
    } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') {
      // GIF: logical screen descriptor w(2 LE) h(2 LE); frames = count of
      // image separators 0x2C at block boundaries — walk the block stream
      val w = le16(b, 6); val h = le16(b, 8)
      var frames = 0
      var i = 13 + (if ((b(10) & 0x80) != 0) 3 * (2 << (b(10) & 7)) else 0)
      var ok = true
      while (ok && i < b.length) {
        (b(i) & 0xff) match {
          case 0x2c => // image descriptor: 9 bytes + optional local table
            frames += 1
            val local = if (i + 9 < b.length && (b(i + 9) & 0x80) != 0)
              3 * (2 << (b(i + 9) & 7)) else 0
            i += 10 + local + 1 // + LZW min code size byte
            // data sub-blocks: len byte then payload, until 0 terminator
            while (i < b.length && (b(i) & 0xff) != 0) i += 1 + (b(i) & 0xff)
            i += 1
          case 0x21 => // extension: label byte then sub-blocks
            i += 2
            while (i < b.length && (b(i) & 0xff) != 0) i += 1 + (b(i) & 0xff)
            i += 1
          case 0x3b => ok = false // trailer
          case _ => ok = false
        }
      }
      ("gif", w, h, frames)
    } else ("unknown", 0, 0, 0)
  }

  /** Batched per-partition decode: header parse + content hash. The batch
    * signature (Iterator -> Iterator) is where a per-task decoder amortizes
    * init (here: one MessageDigest per task). */
  def decodeBatch(it: Iterator[(Long, Array[Byte])]): Iterator[MediaMeta] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    it.map { case (id, bytes) =>
      val (fmt, w, h, fr) = parseImageHeader(bytes)
      md.reset()
      val hex = md.digest(bytes).map("%02x".format(_)).mkString
      MediaMeta(id, fmt, w, h, fr, bytes.length, hex)
    }
  }

  /** Pipeline over any (doc_id, media) binary frame: batched per-partition
    * decode -> typed metadata (the Scala analog of a Pandas-UDF mapInPandas
    * batch). */
  def decodeMeta(spark: SparkSession, blobs: DataFrame): DataFrame = {
    import spark.implicits._
    blobs.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(decodeBatch)
      .toDF()
      .orderBy("doc_id")
  }

  /** Gate pipeline: real PNG generation -> binary column -> real header
    * decode. Output restricted to the oracle-computable columns (dims are a
    * stated function of doc_id; n_bytes/sha depend on the PNG encoder's
    * byte stream and are asserted in MultimodalSpec instead).
    *
    * Decodes through a slim header-only batch (NOT [[decodeBatch]]): the
    * mapPartitions is opaque to Catalyst, so the select above could never
    * prune the SHA-256 content hash decodeBatch computes per blob — work
    * this gate's output provably discards (guide §2.3 "project before
    * opaque operations"; decodeMeta keeps the hash for consumers that want
    * it). */
  def extractMeta(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    withImageBlob(documents).select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (fmt, w, h, fr) = parseImageHeader(bytes)
        (id, fmt, w, h, fr)
      })
      .toDF("doc_id", "fmt", "width", "height", "frames")
      .orderBy("doc_id")
  }

  // ---- audio / video containers (WAV RIFF, MP4 ISO-BMFF) --------------

  // gate A/V laws (shared by withAvBlob and the oracle): even doc_ids get a
  // PCM WAV, odd ones an MP4 moov. All derived metadata is integer-exact:
  // rates divide 1000, the mvhd timescale is 600 with duration a multiple
  // of 60, so duration_ms round-trips through the container untouched.
  private[graft] def wavRate(docId: Long): Int = 8000 * (1 + (docId % 3).toInt)
  private[graft] def wavChannels(docId: Long): Int = 1 + ((docId % 4) / 2).toInt
  private[graft] def wavDurationMs(docId: Long): Int = 1 + (docId % 29).toInt
  private[graft] def mp4DurationMs(docId: Long): Int = 100 * (1 + (docId % 50).toInt)
  private[graft] def mp4Width(docId: Long): Int = 320 + 16 * (docId % 8).toInt
  private[graft] def mp4Height(docId: Long): Int = 240 + 16 * (docId % 5).toInt

  private def le16w(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def le32w(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff); o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
  }
  private def be32w(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 24) & 0xff); o.write((v >> 16) & 0xff); o.write((v >> 8) & 0xff); o.write(v & 0xff)
  }
  private def tag(o: java.io.ByteArrayOutputStream, s: String): Unit =
    o.write(s.getBytes("US-ASCII"))

  /** Deterministic real PCM WAV bytes (RIFF/WAVE, fmt + data chunks,
    * 16-bit samples f(doc_id, i)). */
  private[graft] def wavBytes(docId: Long): Array[Byte] = {
    val rate = wavRate(docId); val ch = wavChannels(docId)
    val nsamples = rate * wavDurationMs(docId) / 1000
    val blockAlign = ch * 2
    val dataSize = nsamples * blockAlign
    val o = new java.io.ByteArrayOutputStream(44 + dataSize)
    tag(o, "RIFF"); le32w(o, 36 + dataSize); tag(o, "WAVE")
    tag(o, "fmt "); le32w(o, 16)
    le16w(o, 1); le16w(o, ch); le32w(o, rate); le32w(o, rate * blockAlign)
    le16w(o, blockAlign); le16w(o, 16)
    tag(o, "data"); le32w(o, dataSize)
    var i = 0
    while (i < nsamples * ch) {
      le16w(o, ((docId * 31 + i * 7919) & 0xffff).toInt)
      i += 1
    }
    o.toByteArray
  }

  /** Deterministic minimal MP4 (ISO BMFF): ftyp + moov(mvhd + trak(tkhd))
    * + a token mdat. Box sizes are real; mvhd v0 carries timescale 600 and
    * the law duration; tkhd v0 carries 16.16 fixed-point dimensions. */
  private[graft] def mp4Bytes(docId: Long): Array[Byte] = {
    val timescale = 600
    val dur = mp4DurationMs(docId) * timescale / 1000
    def box(typ: String)(body: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      body(b)
      val o = new java.io.ByteArrayOutputStream(8 + b.size)
      be32w(o, 8 + b.size); tag(o, typ); b.writeTo(o)
      o.toByteArray
    }
    val mvhd = box("mvhd") { b =>
      be32w(b, 0) // version 0 + flags
      be32w(b, 0); be32w(b, 0) // ctime, mtime
      be32w(b, timescale); be32w(b, dur)
      be32w(b, 0x00010000); le16w(b, 0); le16w(b, 0) // rate 1.0, volume+rsvd
      (0 until 2).foreach(_ => be32w(b, 0)) // reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(be32w(b, _))
      (0 until 6).foreach(_ => be32w(b, 0)) // pre_defined
      be32w(b, 2) // next track id
    }
    val tkhd = box("tkhd") { b =>
      be32w(b, 7) // version 0, flags: enabled|in movie|in preview
      be32w(b, 0); be32w(b, 0) // ctime, mtime
      be32w(b, 1); be32w(b, 0) // track id, reserved
      be32w(b, dur)
      be32w(b, 0); be32w(b, 0) // reserved
      le16w(b, 0); le16w(b, 0); le16w(b, 0); le16w(b, 0) // layer, alt, vol, rsvd
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(be32w(b, _))
      be32w(b, mp4Width(docId) << 16); be32w(b, mp4Height(docId) << 16)
    }
    val trak = box("trak")(b => b.write(tkhd))
    val moov = box("moov") { b => b.write(mvhd); b.write(trak) }
    val ftyp = box("ftyp") { b => tag(b, "isom"); be32w(b, 512); tag(b, "isom"); tag(b, "mp41") }
    val mdat = box("mdat")(b => be32w(b, (docId & 0xffffffffL).toInt))
    val o = new java.io.ByteArrayOutputStream()
    o.write(ftyp); o.write(moov); o.write(mdat)
    o.toByteArray
  }

  /** documents + a real A/V binary column: even doc_ids PCM WAV, odd MP4. */
  def withAvBlob(documents: DataFrame): DataFrame = {
    val gen = udf((id: Long) => if (id % 2 == 0) wavBytes(id) else mp4Bytes(id))
    documents.select(col("doc_id"), gen(col("doc_id")).as("media"),
      when(col("doc_id") % 2 === 0, "audio/wav").otherwise("video/mp4").as("mime"))
  }

  final case class AvMeta(doc_id: Long, fmt: String, sample_rate: Int,
                          channels: Int, duration_ms: Long, width: Int,
                          height: Int, n_bytes: Int)

  /** (fmt, sampleRate, channels, durationMs, width, height) from real WAV
    * RIFF-chunk / MP4 box walks; ("unknown", 0…) when no magic matches or
    * the container is truncated mid-structure. Pure function of the bytes. */
  private[graft] def parseAvHeader(b: Array[Byte]): (String, Int, Int, Long, Int, Int) = {
    val none = ("unknown", 0, 0, 0L, 0, 0)
    def le32(i: Int): Long =
      (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) | ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    def fourcc(i: Int): String =
      new String(Array(b(i), b(i + 1), b(i + 2), b(i + 3)), "US-ASCII")
    if (b.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "WAVE") {
      // WAV: walk RIFF chunks for fmt (rate/channels/blockAlign) and data
      // (sample count); chunks are word-aligned (odd sizes pad one byte)
      var rate = 0; var ch = 0; var blockAlign = 0; var dataSize = -1L
      var i = 12
      while (i + 8 <= b.length && (dataSize < 0 || rate == 0)) {
        val typ = fourcc(i); val sz = le32(i + 4)
        if (typ == "fmt " && i + 24 <= b.length) {
          ch = le16(b, i + 10); rate = le32(i + 12).toInt
          blockAlign = le16(b, i + 20)
        } else if (typ == "data") dataSize = sz
        // A declared size past the buffer end (truncated or corrupt — e.g.
        // 0xFFFFFFF8 whose toInt is negative) must end the walk, not stall it.
        if (sz > b.length - i - 8) i = b.length
        else i += 8 + sz.toInt + (sz.toInt & 1)
      }
      if (rate <= 0 || blockAlign <= 0 || dataSize < 0) ("wav", rate, ch, 0L, 0, 0)
      else ("wav", rate, ch, dataSize / blockAlign * 1000L / rate, 0, 0)
    } else if (b.length >= 12 && fourcc(4) == "ftyp") {
      // MP4/ISO-BMFF: top-level box walk to moov, then child walks to mvhd
      // (timescale + duration) and trak/tkhd (16.16 fixed-point dims)
      def be32u(i: Int): Long = ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
      def findBox(lo: Int, hi: Int, typ: String): Int = {
        var i = lo
        while (i + 8 <= hi) {
          val sz = be32u(i)
          if (sz < 8) return -1 // corrupt: would loop forever
          if (fourcc(i + 4) == typ) return i
          if (sz > hi - i) return -1 // truncated/corrupt: toInt may go negative
          i += sz.toInt
        }
        -1
      }
      val end = b.length
      val moov = findBox(0, end, "moov")
      if (moov < 0) none.copy(_1 = "mp4")
      else {
        val moovEnd = math.min(end, moov + be32u(moov).toInt)
        var durMs = 0L
        val mvhd = findBox(moov + 8, moovEnd, "mvhd")
        if (mvhd >= 0 && mvhd + 28 <= end && b(mvhd + 8) == 0) {
          val timescale = be32u(mvhd + 20)
          val dur = be32u(mvhd + 24)
          if (timescale > 0) durMs = dur * 1000L / timescale
        }
        var w = 0; var h = 0
        val trak = findBox(moov + 8, moovEnd, "trak")
        if (trak >= 0) {
          val trakEnd = math.min(end, trak + be32u(trak).toInt)
          val tkhd = findBox(trak + 8, trakEnd, "tkhd")
          if (tkhd >= 0 && tkhd + 92 <= end && b(tkhd + 8) == 0) {
            w = (be32u(tkhd + 84) >> 16).toInt
            h = (be32u(tkhd + 88) >> 16).toInt
          }
        }
        ("mp4", 0, 0, durMs, w, h)
      }
    } else none
  }

  /** Batched per-partition A/V decode — same Iterator->Iterator shape as
    * [[decodeBatch]]. */
  def decodeAvBatch(it: Iterator[(Long, Array[Byte])]): Iterator[AvMeta] =
    it.map { case (id, bytes) =>
      val (fmt, rate, ch, durMs, w, h) = parseAvHeader(bytes)
      AvMeta(id, fmt, rate, ch, durMs, w, h, bytes.length)
    }

  /** Pipeline over any (doc_id, media) binary frame. */
  def decodeAvMeta(spark: SparkSession, blobs: DataFrame): DataFrame = {
    import spark.implicits._
    blobs.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(decodeAvBatch)
      .toDF()
      .orderBy("doc_id")
  }

  /** Gate pipeline: real WAV/MP4 generation -> binary column -> real
    * container parse; columns restricted to the oracle-stated laws. */
  def extractAvMeta(spark: SparkSession, documents: DataFrame): DataFrame =
    decodeAvMeta(spark, withAvBlob(documents))
      .select(col("doc_id"), col("fmt"), col("sample_rate"), col("channels"),
        col("duration_ms"), col("width"), col("height"))
}
