package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{Turn => _}

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, plus a decode/feature-extract stage.
  *
  * The container has no image/audio codecs, so `fakeDecode` is a clearly
  * marked deterministic STUB standing in for a real decoder — the Spark-side
  * plumbing (binary schema, batched per-partition processing shape, metadata
  * extraction, partition-friendly layout) is real and tested. A production
  * decoder drops into `decodeBatch` without touching the pipeline.
  */
object Multimodal {

  /** Synthesize a binary "media blob" column from text (deterministic). */
  def withBlob(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("application/x-fake-media").as("mime"))

  final case class MediaMeta(doc_id: Long, n_bytes: Int, sha: String,
                             width: Int, height: Int, frames: Int)

  /** STUB decoder: deterministic pseudo-metadata from the blob bytes. A real
    * implementation would parse container headers / decode frames here; the
    * batch signature (Iterator[blob] -> Iterator[meta]) matches how a real
    * per-partition decoder amortizes codec init across rows. */
  def decodeBatch(it: Iterator[(Long, Array[Byte])]): Iterator[MediaMeta] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    it.map { case (id, bytes) =>
      md.reset()
      val dig = md.digest(bytes)
      val hex = dig.map("%02x".format(_)).mkString
      // fake dimensions derived from the digest — stands in for ??? (real decode)
      val w = 320 + (java.lang.Integer.parseInt(hex.substring(0, 4), 16) % 1600)
      val h = 240 + (java.lang.Integer.parseInt(hex.substring(4, 8), 16) % 840)
      val fr = 1 + (java.lang.Integer.parseInt(hex.substring(8, 12), 16) % 240)
      MediaMeta(id, bytes.length, hex, w, h, fr)
    }
  }

  /** Pipeline: blob column -> per-partition batched decode -> typed metadata.
    * mapPartitions keeps decoder state per task (the Scala analog of a
    * Pandas-UDF mapInPandas batch). */
  def extractMeta(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    withBlob(documents)
      .select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(decodeBatch)
      .toDF()
      .orderBy("doc_id")
  }
}
