package graft.tools

import org.apache.spark.sql.SparkSession
import graft.streaming.{EventStream, SizedFlush}

/** Diagnostic: per-micro-batch durations of the stream_sized_flush gate
  * drive — separates streaming-engine fixed cost (batch count × trigger
  * overhead) from the data-proportional segment work.
  *
  * `scale [nEvents] [nBatches]` mode: feeds a deterministic synthetic
  * event stream (hour buckets, ~1k events/bucket) through
  * [[SizedFlush.segments]] in chronological micro-batches and reports each
  * batch's wall time and state rows — the scale claims are (a) per-batch
  * cost stays FLAT as cumulative input grows (per-bucket O(1) state, no
  * store rescans) and (b) state rows track LIVE buckets, not corpus size
  * (closed buckets time out and leave the store). */
object SizedFlushProbe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("scale")) {
      scaleProbe(args.lift(1).map(_.toLong).getOrElse(2000000L),
        args.lift(2).map(_.toInt).getOrElse(10))
      return
    }
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-sized-flush-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 2).foreach { round =>
      val streamDir = java.nio.file.Files.createTempDirectory("graft-szprobe")
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"),
        java.nio.file.Path.of(sfDir, "events.parquet").toAbsolutePath)
      val t0 = System.nanoTime()
      val src = spark.readStream.schema(EventStream.schema).parquet(streamDir.toString)
      val q = SizedFlush.segments(src, 128L).writeStream
        .format("memory").queryName(s"szprobe_$round").outputMode("append").start()
      q.processAllAvailable()
      val wall = (System.nanoTime() - t0) / 1e9
      val n = spark.table(s"szprobe_$round").count()
      println(f"[szprobe] round=$round wall=$wall%.2fs rows=$n")
      q.recentProgress.foreach { p =>
        println(f"[szprobe]   batch=${p.batchId} rows=${p.numInputRows} " +
          f"durationMs=${p.durationMs} stateRows=${p.stateOperators.map(_.numRowsTotal).mkString(",")}")
      }
      q.stop()
    }
    spark.stop()
  }

  private def scaleProbe(nEvents: Long, nBatches: Int): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-sized-flush-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // ~1000 events per hour bucket, ids chronological: event k lands in
    // hour k/1000 at minute-grain offsets; props size varies 8..40 bytes so
    // segment cuts land at irregular boundaries (like real payloads)
    val perBucket = 1000L
    val base = 1735689600L // 2025-01-01 00:00:00 UTC, epoch seconds
    def batchDf(b: Int) = {
      val lo = nEvents * b / nBatches; val hi = nEvents * (b + 1) / nBatches
      spark.range(lo, hi).select(
        col("id").as("event_id"),
        timestamp_seconds(lit(base) + (col("id") / perBucket).cast("long") * 3600L +
          (col("id") % perBucket) * 3L).as("ts"),
        expr("repeat('x', CAST(id % 33 + 8 AS INT))").as("props"))
    }
    val src = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val q = SizedFlush.segments(src.toDS().toDF("event_id", "ts", "props"), 4096L)
      .writeStream.format("memory").queryName("szscale").outputMode("append").start()
    try {
      (0 until nBatches).foreach { b =>
        val rows = batchDf(b).as[(Long, java.sql.Timestamp, String)].collect()
        val t0 = System.nanoTime()
        src.addData(rows.toIndexedSeq)
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        val p = q.recentProgress.filter(_.numInputRows > 0).lastOption
        val state = q.recentProgress.lastOption
          .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
        println(f"[szscale] batch=$b rows=${rows.length} wall=$sec%.2fs " +
          f"(${rows.length / sec}%.0f ev/s) stateRows=$state")
      }
      val segs = spark.table("szscale")
      val byReason = segs.groupBy("reason").count().as[(String, Long)].collect().toMap
      println(s"[szscale] total events=$nEvents segments=${segs.count()} " +
        s"size=${byReason.getOrElse("size", 0L)} timeout=${byReason.getOrElse("timeout", 0L)}")
    } finally q.stop()
    spark.stop()
  }
}
