package graft.tools

import org.apache.spark.sql.SparkSession
import graft.streaming.{EventStream, SizedFlush}

/** Diagnostic: per-micro-batch durations of the stream_sized_flush gate
  * drive — separates streaming-engine fixed cost (batch count × trigger
  * overhead) from the data-proportional segment work. */
object SizedFlushProbe {
  def main(args: Array[String]): Unit = {
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
}
