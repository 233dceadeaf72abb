package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.Schemas

/** Streaming transcript ingestion — the rebuild of the reference's docformat
  * daemon + dm_src_provider (SURVEY.md §2.1 S2, §2.8): a directory-monitor
  * source that discovers new files, appends them to the docstore landing
  * table exactly once, and survives restarts.
  *
  * Mapping: the reference polls directories on an interval and persists a
  * high-watermark file (builder/docformat/src/main/dm_src_provider.go);
  * Structured Streaming's file source + checkpoint directory provide exactly
  * those semantics (discovered-files log in the checkpoint = the watermark
  * file; at-least-once upload with bak/bad renames, T4
  * logto_hdfs_collector.go:736-786, becomes exactly-once via the sink's
  * commit log). The batch index build then runs per completed partition —
  * the reference's daily epoch (T5).
  */
object TranscriptIngest {

  /** Start ingesting transcript parquet files landing in `inDir` into the
    * append-only landing table at `outDir`. Returns the running query;
    * callers use processAllAvailable() in tests / await in production.
    */
  def start(spark: SparkSession, inDir: String, outDir: String,
            checkpointDir: String): StreamingQuery = {
    spark.readStream
      .schema(Schemas.turn)
      .option("maxFilesPerTrigger", "16") // bounded micro-batches at scale
      .parquet(inDir)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
