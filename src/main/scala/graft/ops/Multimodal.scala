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
    * pixels are a function of (doc_id, x, y). Runs per executor task —
    * BufferedImage + ImageIO are headless-safe JDK code. */
  private[graft] def pngBytes(docId: Long): Array[Byte] = {
    val w = gateWidth(docId); val h = gateHeight(docId)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (docId * 2654435761L + x * 31 + y).toInt & 0xffffff)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
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
    * byte stream and are asserted in MultimodalSpec instead). */
  def extractMeta(spark: SparkSession, documents: DataFrame): DataFrame =
    decodeMeta(spark, withImageBlob(documents))
      .select(col("doc_id"), col("fmt"), col("width"), col("height"), col("frames"))
}
