package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Queue-source slot — the reference's Redis-list (S3,
  * builder/docformat/src/main/redis_src_provider.go) and NSQ (S4,
  * nsq_src_provider.go) providers. Both are the same abstraction: an
  * UNORDERED, AT-LEAST-ONCE feed of raw lines (BRPOP / topic consume, with
  * redelivery after a crash) parsed into turns. The Spark-native shape is
  * source-agnostic: ANY streaming Dataset of lines — Kafka, socket, files,
  * a MemoryStream in tests — goes through the same parse + in-stream dedup
  * + append, so "which queue" is a one-line `readStream.format(...)` choice
  * instead of a per-queue provider implementation.
  *
  * Delivery semantics: `dropDuplicatesWithinWatermark` on the natural key
  * (conv_id, turn_idx) turns at-least-once delivery into exactly-once
  * materialization — STRONGER than the reference, whose redelivered lines
  * land in the docstore twice. Dedup state is bounded by the watermark
  * (queue redelivery is near-time by nature), so it holds at 100 TB where
  * an unbounded `dropDuplicates` would not.
  */
object QueueIngest {

  /** Parse TAB lines (reference CommonLogParser TAB member, P2:
    * conv_id, turn_idx, role, text, tool, ts) from `lines` (one string
    * column `value`) and append exactly-once to `outDir`. */
  def dedupedAppend(spark: SparkSession, lines: DataFrame, outDir: String,
                    checkpointDir: String, lateness: String = "1 hour"): StreamingQuery = {
    lines
      .select(split(col("value"), "\t").as("f"))
      .select(
        col("f").getItem(0).as("conv_id"),
        col("f").getItem(1).cast("int").as("turn_idx"),
        col("f").getItem(2).as("role"),
        col("f").getItem(3).as("text"),
        col("f").getItem(4).as("tool"),
        col("f").getItem(5).cast("timestamp").as("ts"))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("conv_id", "turn_idx")
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
  }
}
