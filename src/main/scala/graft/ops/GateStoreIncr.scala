package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate harness for the store-backed incremental dedup layer: drives the
  * PRODUCTION micro-batch path ([[graft.streaming.StreamDedup.processBatch]]
  * — epoch guard, corpus append, signature-store append, band-row pairs,
  * compaction) over the sf documents table split into two epoch-ordered
  * batches at doc_id 400, then returns the second batch's emitted pairs.
  * By the epoch-suffix contract those are exactly the pairs with
  * b >= 400, so the DuckDB oracle is the same incremental LSH SQL as
  * dedup_lsh_incr — the streaming-dedup layer gets an oracle-checked row,
  * not just specs. Batch 0's store partitions are COMPACTED before the
  * second batch runs, so the oracle also holds pairs-after-compaction to
  * account. */
object GateStoreIncr {
  def pairs(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val base = java.nio.file.Files.createTempDirectory("graft-gate-storeincr").toString
    val corpus = s"$base/corpus"
    val pairsDir = s"$base/pairs"
    graft.streaming.StreamDedup.processBatch(
      spark, docs.filter(col("doc_id") < 400), 0L, corpus, pairsDir, 0.95)
    SignatureStore.compact(spark, s"$corpus-sigstore", upTo = 0L)
    graft.streaming.StreamDedup.processBatch(
      spark, docs.filter(col("doc_id") >= 400), 1L, corpus, pairsDir, 0.95)
    spark.read.parquet(pairsDir)
      .filter(col("batch_id").cast("long") === 1L)
      .select(col("a"), col("b"), col("j"))
      .orderBy("a", "b")
  }
}
