package graft.streaming

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference collector's SIZE-TRIGGERED early flush (SURVEY.md §2.8 T3,
  * builder/docformat/src/job/logto_hdfs_collector.go:215-242): each
  * time-bucket accumulates items and flushes a merged segment EARLY the
  * moment accumulated bytes reach `max_merge_file_size`, resetting the
  * accumulator; whatever remains flushes when the bucket's lateness window
  * closes (the T2 rule, flush:337-390). Spark-native form: a watermarked
  * `flatMapGroupsWithState` keyed by bucket —
  *
  *   - size flush  → emitted inline while processing a micro-batch, the
  *     moment the running segment reaches the threshold;
  *   - lateness flush → `GroupStateTimeout.EventTimeTimeout` at bucket end,
  *     firing once the watermark (max event time − 1 h) passes it.
  *
  * State is O(1) PER BUCKET — the pending segment's (seq, n, bytes,
  * first/last id), never buffered rows — the same shape as the reference's
  * per-minute `LogInfo{logs, totalSize}` manifest, so state size at 100 TB
  * is bounded by live buckets, not data volume. Emitted rows are segment
  * MANIFESTS (n, bytes, id range, flush reason); a downstream merge job
  * consumes them exactly as the reference's copyLogToHdfs consumed the
  * accumulated file list. One micro-batch's rows for a bucket are sorted by
  * event_id before cutting, so segmentation is a pure function of (input,
  * batch boundaries) — the group iterator's own order is shuffle-dependent
  * and would otherwise leak nondeterminism into segment boundaries. That
  * buffers one bucket×batch of slim (id, sz) pairs per task, bounded by
  * bucket time-width exactly as the reference's per-minute map was.
  *
  * Stragglers AFTER a bucket's timeout flush (event delay > lateness +
  * bucket width — fMGWS does not pre-drop late rows) start a FRESH segment
  * lineage: seq restarts at 0 and the timeout re-arms just past the current
  * watermark. This mirrors the reference exactly — its flush deletes
  * `logMap[minute]` and a straggler file re-creates the entry, producing an
  * additional merge file for the same minute (collector.go:215-242). A
  * consumer needing cross-lineage identity keys on (bucket, first_id),
  * which stays unique; (bucket, seq) alone is unique only within a lineage.
  */
object SizedFlush {

  /** Pending (unflushed) segment of one bucket: the running accumulator the
    * reference kept in `LogInfo`. `seq` numbers segments per bucket from 0
    * across micro-batches (it rides the state, so a restart resumes it). */
  case class PendSeg(seq: Int, n: Long, bytes: Long, firstId: Long, lastId: Long)

  /** One flushed segment manifest; `reason` is "size" (early flush) or
    * "timeout" (lateness flush of the remainder). */
  case class Segment(bucket: String, seq: Int, n: Long, bytes: Long,
                     first_id: Long, last_id: Long, reason: String)

  /** Per-item payload size: declared content bytes plus a fixed per-record
    * overhead (id + timestamp framing), mirroring the reference's use of the
    * on-disk file size rather than raw text length. */
  val RecordOverheadBytes = 16L

  private val fmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)

  /** The streaming transform: `events` must be a STREAMING frame with
    * columns (event_id LONG, ts TIMESTAMP, props STRING). Buckets are
    * event-time hours (the reference's gatherMinute, scaled to the test
    * corpus's spread); lateness is 1 hour, matching [[EventStream]]. */
  def segments(events: DataFrame, maxBytes: Long): Dataset[Segment] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .select(col("event_id"),
        (coalesce(octet_length(col("props")), lit(0)).cast("long") + RecordOverheadBytes).as("sz"),
        (unix_timestamp(date_trunc("hour", col("ts"))) * 1000L).as("bucket_ms"),
        col("ts"))
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[PendSeg, Segment](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bucketMs: Long, rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[PendSeg]) =>
          val bucket = fmt.format(java.time.Instant.ofEpochMilli(bucketMs))
          if (state.hasTimedOut) {
            // lateness flush: emit the remainder (if any) and drop the state
            val p = state.get
            state.remove()
            if (p.n > 0)
              Iterator(Segment(bucket, p.seq, p.n, p.bytes, p.firstId, p.lastId, "timeout"))
            else Iterator.empty
          } else {
            // deterministic processing order within the micro-batch
            val sorted = rows.map(r => (r._1, r._2)).toArray.sortBy(_._1)
            var p = state.getOption.getOrElse(PendSeg(0, 0L, 0L, 0L, 0L))
            val out = Array.newBuilder[Segment]
            sorted.foreach { case (id, sz) =>
              p = PendSeg(p.seq, p.n + 1, p.bytes + sz,
                if (p.n == 0) id else p.firstId, id)
              if (p.bytes >= maxBytes) { // the reference's >= maxMergeFileByte
                out += Segment(bucket, p.seq, p.n, p.bytes, p.firstId, p.lastId, "size")
                p = PendSeg(p.seq + 1, 0L, 0L, 0L, 0L)
              }
            }
            state.update(p)
            // lateness flush due when the watermark passes bucket end; for
            // in-bound data of an already-closed bucket (possible because
            // fMGWS does not pre-drop late rows) re-arm just past the
            // current watermark so the late remainder still flushes
            state.setTimeoutTimestamp(
              math.max(bucketMs + 3600000L, state.getCurrentWatermarkMs() + 1L))
            out.result().iterator
          }
      }
  }

  private val nameCounter = new AtomicInteger(0)

  /** Gate harness: feeds the batch events table through [[segments]] as one
    * file-source micro-batch and returns every flushed segment — size
    * flushes for all buckets plus lateness flushes for the buckets the
    * final watermark closed (the no-data batch after the watermark update
    * fires the timeouts, exactly like the append gate's window closes). */
  def sizedFlushGate(spark: SparkSession, sfDir: String, maxBytes: Long = 128L): DataFrame = {
    val table = s"graft_sized_flush_${nameCounter.incrementAndGet()}"
    val streamDir = java.nio.file.Files.createTempDirectory("graft-sized-flush")
    streamDir.toFile.deleteOnExit()
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Path.of(sfDir, "events.parquet").toAbsolutePath)
    val src = spark.readStream.schema(EventStream.schema).parquet(streamDir.toString)
    // the stateful operator gets one state-store instance PER shuffle
    // partition PER micro-batch (delta file writes, maintenance); at gate
    // scale (720 hour-buckets) 8 state partitions carry the same
    // parallelism headroom at a quarter of the store overhead — a real
    // deployment sizes this to live-bucket count, not data volume
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val q = segments(src, maxBytes).writeStream
        .format("memory")
        .queryName(table)
        .outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    spark.table(table).orderBy("bucket", "seq")
  }
}
