package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.streaming.{EventStream, SizedFlush}

/** T3 size-triggered flush semantics (SizedFlush): a bucket's segment is
  * emitted EARLY the moment accumulated bytes reach the threshold — before
  * any watermark movement — and the remainder flushes exactly once when the
  * watermark closes the bucket; the accumulator and segment numbering carry
  * across micro-batches through the state. */
class SizedFlushSpec extends SparkFunSuite {
  import spark.implicits._

  // props of length L contributes L + 16 bytes (RecordOverheadBytes)
  private def ev(id: Long, tss: String, props: String) =
    (id, tss, 1L, "click", 1.0, props)

  private def writeBatch(dir: String, name: String,
                         rows: Seq[(Long, String, Long, String, Double, String)]): Unit = {
    rows.toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .select(col("event_id"), col("tss").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/.stage-$name")
    val part = new java.io.File(s"$dir/.stage-$name").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, Paths.get(dir, s"$name.parquet"))
  }

  test("size flush fires inside a batch; remainder waits for the watermark; state carries over") {
    val src = SparkSpec.tmpDir("sized-src")
    val table = "sized_flush_spec_1"
    val stream = spark.readStream.schema(EventStream.schema).parquet(src)
    // threshold 100: four 9-byte-props rows (4 x 25 = 100) fill a segment
    val q = SizedFlush.segments(stream, 100L).writeStream
      .format("memory").queryName(table).outputMode("append").start()
    try {
      // batch 1, bucket 00: 5 rows of sz 25 -> one "size" segment of 4
      // (ids DELIBERATELY landed out of order: segmentation must sort), 1 pending
      writeBatch(src, "b1", Seq(
        ev(12L, "2026-01-01 00:20:00", "aaaaaaaaa"),
        ev(10L, "2026-01-01 00:05:00", "aaaaaaaaa"),
        ev(13L, "2026-01-01 00:25:00", "aaaaaaaaa"),
        ev(11L, "2026-01-01 00:10:00", "aaaaaaaaa"),
        ev(14L, "2026-01-01 00:40:00", "aaaaaaaaa")))
      q.processAllAvailable()
      val after1 = spark.table(table).as[SizedFlush.Segment].collect().sortBy(s => (s.bucket, s.seq))
      assert(after1.toSeq == Seq(
        SizedFlush.Segment("2026-01-01 00:00:00", 0, 4, 100, 10, 13, "size")),
        s"got: ${after1.toSeq}")

      // batch 2: 3 more bucket-00 rows -> pending (25) + 75 = 100 fills
      // segment seq=1 ACROSS the batch boundary; plus a far-future row that
      // pushes the watermark past bucket 00's end -> remainder times out.
      // The future row itself stays pending (its bucket never closes here).
      writeBatch(src, "b2", Seq(
        ev(15L, "2026-01-01 00:45:00", "aaaaaaaaa"),
        ev(16L, "2026-01-01 00:50:00", "aaaaaaaaa"),
        ev(17L, "2026-01-01 00:55:00", "aaaaaaaaa"),
        ev(99L, "2026-01-01 09:30:00", "xx")))
      q.processAllAvailable()
      val after2 = spark.table(table).as[SizedFlush.Segment].collect().sortBy(s => (s.bucket, s.seq))
      assert(after2.toSeq == Seq(
        SizedFlush.Segment("2026-01-01 00:00:00", 0, 4, 100, 10, 13, "size"),
        SizedFlush.Segment("2026-01-01 00:00:00", 1, 4, 100, 14, 17, "size")),
        s"got: ${after2.toSeq}")

      // batch 3: another future row moves the watermark (09:30 -> 11:30-1h);
      // bucket 00 closed already with an EMPTY remainder -> no timeout row
      // for it; bucket 09 closes with its one pending row
      writeBatch(src, "b3", Seq(ev(100L, "2026-01-01 11:30:00", "yy")))
      q.processAllAvailable()
      val after3 = spark.table(table).as[SizedFlush.Segment].collect().sortBy(s => (s.bucket, s.seq))
      assert(after3.toSeq == Seq(
        SizedFlush.Segment("2026-01-01 00:00:00", 0, 4, 100, 10, 13, "size"),
        SizedFlush.Segment("2026-01-01 00:00:00", 1, 4, 100, 14, 17, "size"),
        SizedFlush.Segment("2026-01-01 09:00:00", 0, 1, 18, 99, 99, "timeout")),
        s"got: ${after3.toSeq}")
    } finally q.stop()
  }

  test("an oversized single item is its own segment; conservation holds per closed bucket") {
    val src = SparkSpec.tmpDir("sized-src2")
    val table = "sized_flush_spec_2"
    val stream = spark.readStream.schema(EventStream.schema).parquet(src)
    val q = SizedFlush.segments(stream, 100L).writeStream
      .format("memory").queryName(table).outputMode("append").start()
    try {
      writeBatch(src, "b1", Seq(
        ev(1L, "2026-01-01 00:05:00", "z" * 200), // 216 >= 100 alone
        ev(2L, "2026-01-01 00:10:00", "aaaaaaaaa"),
        ev(3L, "2026-01-01 00:15:00", "aaaaaaaaa"),
        ev(50L, "2026-01-01 05:00:00", "q"))) // closes bucket 00
      q.processAllAvailable()
      val segs = spark.table(table).as[SizedFlush.Segment].collect()
        .filter(_.bucket == "2026-01-01 00:00:00").sortBy(_.seq)
      assert(segs.toSeq == Seq(
        SizedFlush.Segment("2026-01-01 00:00:00", 0, 1, 216, 1, 1, "size"),
        SizedFlush.Segment("2026-01-01 00:00:00", 1, 2, 50, 2, 3, "timeout")),
        s"got: ${segs.toSeq}")
      // conservation: segments of the closed bucket partition its input
      assert(segs.map(_.n).sum == 3 && segs.map(_.bytes).sum == 216 + 25 + 25)
    } finally q.stop()
  }
}
