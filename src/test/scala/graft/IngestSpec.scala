package graft

import java.nio.file.{Files, Paths}
import graft.gen.TranscriptGen
import graft.streaming.{QueueIngest, TranscriptIngest}

/** Streaming ingestion: file-monitor semantics + exactly-once restart
  * (reference dm_src_provider watermark + retry upload, S2/T4). */
class IngestSpec extends SparkFunSuite {
  import spark.implicits._

  test("file-source ingestion is incremental and exactly-once across restarts") {
    val in = SparkSpec.tmpDir("graft-ingest-in")
    val out = SparkSpec.tmpDir("graft-ingest-out")
    val ckpt = SparkSpec.tmpDir("graft-ingest-ckpt")

    def drop(name: String, lo: Long, hi: Long): Unit =
      spark.range(lo, hi, 1, 2).map(t => TranscriptGen.turnAt(t))
        .write.mode("overwrite").parquet(s"$in/$name")

    // batch 1: two files land
    drop("f1", 0, 500)
    drop("f2", 500, 900)
    val q1 = TranscriptIngest.start(spark, s"$in/*", out, ckpt)
    q1.awaitTermination()
    val n1 = spark.read.parquet(out).count()
    assert(n1 == 900)

    // "daemon restart": a new file lands, the stream resumes from checkpoint
    drop("f3", 900, 1200)
    val q2 = TranscriptIngest.start(spark, s"$in/*", out, ckpt)
    q2.awaitTermination()
    val rows = spark.read.parquet(out)
    assert(rows.count() == 1200) // f1/f2 NOT re-ingested (watermark respected)
    // content-exact: every turn present exactly once
    val ids = rows.select("conv_id", "turn_idx").collect()
      .map(r => (r.getString(0), r.getInt(1)))
    assert(ids.length == ids.distinct.length)
    val expected = (0L until 1200L).map(TranscriptGen.turnAt).map(t => (t.conv_id, t.turn_idx)).toSet
    assert(ids.toSet == expected)
  }

  test("queue-source slot (S3 Redis / S4 NSQ): at-least-once lines land exactly once") {
    // both reference queue providers are unordered at-least-once line feeds;
    // MemoryStream plays the queue here (same streaming Dataset[lines]
    // contract as Kafka/socket), including a crash-style REDELIVERY
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    val out = SparkSpec.tmpDir("graft-queue-out")
    val ckp = SparkSpec.tmpDir("graft-queue-ckpt")
    val q = QueueIngest.dedupedAppend(spark, mem.toDF(), out, ckp)
    def line(c: String, i: Int): String =
      s"$c\t$i\tuser\thello turn $i of $c\t-\t2026-01-01 00:0$i:00"
    try {
      mem.addData(line("c1", 0), line("c1", 1), line("c2", 0))
      q.processAllAvailable()
      mem.addData(line("c1", 1), line("c2", 1), line("c2", 1)) // redeliveries + 1 new
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(out)
      .select("conv_id", "turn_idx", "text").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).sorted
    assert(rows.map(t => (t._1, t._2)).toSeq ==
      Seq(("c1", 0), ("c1", 1), ("c2", 0), ("c2", 1))) // each exactly once
    assert(rows.forall { case (c, i, text) => text == s"hello turn $i of $c" })
  }
}
