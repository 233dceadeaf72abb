package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamDedup

/** Streaming dedup: per-batch incremental near-dup pairs against the grown
  * corpus, idempotent under batch replay. */
class StreamDedupSpec extends SparkFunSuite {
  import spark.implicits._

  test("micro-batches emit only pairs touching the batch; cross-batch dups found") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val corpus = SparkSpec.tmpDir("graft-sdd-corpus")
    val pairs = SparkSpec.tmpDir("graft-sdd-pairs")
    val ckpt = SparkSpec.tmpDir("graft-sdd-ckpt")
    val textA = "alpha beta gamma delta epsilon zeta eta theta"
    val textB = "one two three four five six seven eight nine"
    val q = StreamDedup.start(spark, mem.toDF().toDF("doc_id", "text"),
      corpus, pairs, ckpt, threshold = 0.95)
    try {
      // batch 0: in-batch duplicate (1, 3)
      mem.addData((0L, textA), (1L, textB), (2L, "unrelated words entirely here"),
        (3L, textB))
      q.processAllAvailable()
      // batch 1: doc 10 duplicates doc 0 from the PREVIOUS batch
      mem.addData((10L, textA), (11L, "more fresh unique content now"),
        (12L, "and different again completely"))
      q.processAllAvailable()
    } finally q.stop()

    val corpusRows = spark.read.parquet(corpus)
    assert(corpusRows.count() == 7)
    // partition-column values are directory strings -> inferred INT; cast
    assert(corpusRows.select(col("batch_id").cast("long")).distinct().collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L))

    val got = spark.read.parquet(pairs)
      .select(col("batch_id").cast("long"), col("a"), col("b"), col("j")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted
    // batch 0 found its in-batch pair; batch 1 found ONLY the cross-batch
    // pair (the batch-0 pair is not re-emitted — incremental scoping)
    assert(got.toSeq == Seq((0L, 1L, 3L, 1.0), (1L, 0L, 10L, 1.0)), s"got ${got.toSeq}")

    // batch-level result matches the batch operator run directly
    val all = spark.read.parquet(corpus).select("doc_id", "text")
    val direct = graft.ops.Dedup.minhashLshIncremental(all, 10L, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(direct.toSeq == Seq((0L, 10L)))

    // crash-replay idempotence: re-running a committed batch (the engine's
    // at-least-once foreachBatch contract) rewrites its own partition — no
    // duplicate docs, no duplicate pairs
    val replay = Seq((10L, textA), (11L, "more fresh unique content now"),
      (12L, "and different again completely")).toDF("doc_id", "text")
    StreamDedup.processBatch(spark, replay, 1L, corpus, pairs, 0.95)
    assert(spark.read.parquet(corpus).count() == 7)
    val got2 = spark.read.parquet(pairs)
      .select(col("batch_id").cast("long"), col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(got2.toSeq == Seq((0L, 1L, 3L), (1L, 0L, 10L)), s"replay dup: ${got2.toSeq}")
  }
}
