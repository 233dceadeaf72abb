package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous near-duplicate detection — the streaming member of the dedup
  * family: each micro-batch of incoming documents is (1) appended to the
  * corpus table and (2) near-dup-checked against EVERYTHING ingested so far
  * (earlier batches and in-batch), emitting the qualifying pairs to an
  * append-only pairs table. The heavy lifting is
  * [[graft.ops.SignatureStore]]: each batch's text is tokenized and
  * minhash-signed exactly once at ingest; the check is a band join of the
  * batch's signatures against the persisted signature table plus a
  * candidate-driven verify over persisted token sets. DocIds arrive in
  * epoch order, so a micro-batch is a docId suffix of the grown corpus and
  * only pairs with a batch-side member are generated or verified —
  * per-batch cost scales with the batch and its candidates, not the corpus.
  *
  * Exactly-once: the corpus/pairs appends are guarded by the checkpoint's
  * batch commit log the same way the ingest sinks are (foreachBatch runs
  * under the streaming engine's batchId contract — a replayed batch
  * overwrites its own output partition instead of duplicating it, because
  * both writes go to a `batch_id=<id>` partition directory).
  *
  * A restarted query resumes from the checkpoint and re-emits nothing for
  * committed batches (StreamDedupSpec drives a restart).
  */
object StreamDedup {

  /** Start the dedup stream: `docsStream` must be a streaming frame of
    * (doc_id LONG, text STRING) with epoch-ordered doc_ids. Pairs land in
    * `pairsDir` partitioned by batch_id; the corpus accumulates in
    * `corpusDir`. */
  def start(spark: SparkSession, docsStream: DataFrame, corpusDir: String,
            pairsDir: String, checkpointDir: String,
            threshold: Double = 0.95,
            drainAndStop: Boolean = false,
            compactEvery: Int = 0,
            keepersDir: Option[String] = None): StreamingQuery = {
    val w = docsStream
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, corpusDir, pairsDir, threshold,
          compactEvery, keepersDir)
      }
    // AvailableNow drains what already landed then stops (batch-style daily
    // runs); the default trigger keeps consuming (resident service / tests
    // feeding a MemoryStream after start)
    (if (drainAndStop) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** One micro-batch: append docs to the corpus and their signatures/token
    * sets to the signature store (all idempotent per batch via partition
    * overwrite), then emit near-dup pairs touching this batch FROM THE
    * STORE — the batch's text is tokenized exactly once, ever; earlier
    * batches are only touched through columnar signature/tokenset reads
    * (see [[graft.ops.SignatureStore]]). The store lives at
    * `<corpusDir>-sigstore`. */
  private[graft] def processBatch(spark: SparkSession, batch: DataFrame,
                                  batchId: Long, corpusDir: String,
                                  pairsDir: String, threshold: Double,
                                  compactEvery: Int = 0,
                                  keepersDir: Option[String] = None): Unit = {
    val storeDir = s"$corpusDir-sigstore"
    val rows = batch.select(col("doc_id"), col("text")).cache()
    val freshFrom = rows.agg(min("doc_id")).collect()(0)
    if (freshFrom.isNullAt(0)) { rows.unpersist(); return } // empty batch
    // GUARD the epoch-ordered doc_id contract that makes freshFrom =
    // min(batch doc_id) correct: a batch whose min falls at or below an
    // earlier batch's max would silently mis-scope incremental pairs, so
    // fail LOUDLY instead. One slim-column agg over the signature table,
    // excluding this batch's own partition so a crash-replay (whose rows
    // already landed) still passes.
    val sigPath = s"$storeDir/signatures"
    if (new java.io.File(sigPath).exists()) {
      val prevMax = spark.read.parquet(sigPath)
        .filter(col("batch_id") =!= lit(batchId))
        .agg(max("doc_id")).collect()(0)
      if (!prevMax.isNullAt(0))
        require(freshFrom.getLong(0) > prevMax.getLong(0),
          s"epoch-ordered doc_id contract violated: batch $batchId min " +
            s"doc_id ${freshFrom.getLong(0)} <= store max ${prevMax.getLong(0)}")
    }
    // idempotent appends: a replayed batch rewrites ITS batch_id partition
    rows.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(corpusDir)
    graft.ops.SignatureStore.append(spark, rows, storeDir, batchId)
    val pairs = graft.ops.SignatureStore.pairsTouchingFresh(
      spark, storeDir, freshFrom.getLong(0), threshold, batchId = Some(batchId))
    pairs.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(pairsDir)
    // continuous keeper assignment: feed THIS batch's pairs (read back from
    // the just-committed partition — columnar, no pipeline recompute) into
    // the keeper store, which appends contracted merge edges; assignments
    // are then answerable at any moment without replaying pair history
    keepersDir.foreach { kd =>
      val batchPairs = spark.read.parquet(pairsDir)
        .filter(col("batch_id").cast("long") === lit(batchId))
        .select(col("a"), col("b"))
      graft.ops.KeeperStore.update(spark, kd, rows, batchPairs, batchId,
        freshFrom.getLong(0))
    }
    rows.unpersist()
    // periodic compaction of the per-batch store partitions; upTo =
    // batchId - 1 is replay-safe (foreachBatch serializes batches — only
    // the in-flight batch can ever replay, and its partitions are untouched)
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
      graft.ops.SignatureStore.compact(spark, storeDir, batchId - 1)
      keepersDir.foreach(kd => graft.ops.KeeperStore.compact(spark, kd, batchId - 1))
    }
  }
}
