package graft

import java.nio.file.{Files, Paths}
import graft.gen.TranscriptGen
import graft.streaming.TranscriptIngest

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
}
