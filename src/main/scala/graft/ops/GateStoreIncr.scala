package graft.ops

import java.util.concurrent.ConcurrentHashMap
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
  * account.
  *
  * Memoized in the GateIvf pattern: the drive writes into a stable /tmp
  * location stamped with a content fingerprint of the documents table, and
  * later calls (bench second passes, repeated Verify runs) read the
  * persisted pairs instead of re-running the two-batch pipeline (~36 s at
  * sf0.1). A documents.parquet regenerated in place invalidates the stamp. */
object GateStoreIncr {

  /** Bump on ANY change to StreamDedup/SignatureStore/KeeperStore semantics
    * or layout. */
  private val Version = 2

  private val cache = new ConcurrentHashMap[String, String]()

  /** Run (or reuse) the two-batch drive; returns the drive's base dir. */
  private def drive(spark: SparkSession, sfDir: String): String =
    cache.computeIfAbsent(sfDir, { _ =>
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val fpRow = docs.selectExpr(
        "count(*) AS n",
        "bit_xor(xxhash64(doc_id, text)) AS fp").collect()(0)
      val n = fpRow.getLong(0)
      val fp = if (fpRow.isNullAt(1)) 0L else fpRow.getLong(1)
      val safe = sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
      val base = s"/tmp/graft-gate-storeincr/$safe"
      val out = s"$base/pairs"
      val stampFile = new java.io.File(s"$base-stamp")
      val stamp = s"gatestoreincr-v$Version-n$n-fp$fp"
      val fresh = try {
        stampFile.exists() &&
          new String(java.nio.file.Files.readAllBytes(stampFile.toPath), "UTF-8") == stamp &&
          new java.io.File(out).exists() && spark.read.parquet(out).columns.contains("batch_id")
      } catch { case _: Throwable => false }
      if (!fresh) {
        graft.FsUtil.deleteRecursively(new java.io.File(base))
        stampFile.delete()
        val corpus = s"$base/corpus"
        val keepers = Some(s"$base/keepers")
        graft.streaming.StreamDedup.processBatch(
          spark, docs.filter(col("doc_id") < 400), 0L, corpus, out, 0.95,
          keepersDir = keepers)
        // compact BOTH stores mid-drive so the fresh batch runs against
        // folded state — bake + newer-edge contraction are oracle-covered
        SignatureStore.compact(spark, s"$corpus-sigstore", upTo = 0L)
        KeeperStore.compact(spark, keepers.get, upTo = 0L)
        graft.streaming.StreamDedup.processBatch(
          spark, docs.filter(col("doc_id") >= 400), 1L, corpus, out, 0.95,
          keepersDir = keepers)
        java.nio.file.Files.createDirectories(stampFile.toPath.getParent)
        java.nio.file.Files.write(stampFile.toPath, stamp.getBytes("UTF-8"))
      }
      base
    })

  def pairs(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"${drive(spark, sfDir)}/pairs")
      .filter(col("batch_id").cast("long") === 1L)
      .select(col("a"), col("b"), col("j"))
      .orderBy("a", "b")

  /** Keeper assignment maintained continuously by the drive (KeeperStore
    * updated per batch, compacted between them) — equals the one-call
    * [[Dedup.keepers]] over the full corpus, which is what the DuckDB
    * recursive-CTE oracle states. */
  def keepers(spark: SparkSession, sfDir: String): DataFrame =
    KeeperStore.assignments(spark, s"${drive(spark, sfDir)}/keepers")
}
