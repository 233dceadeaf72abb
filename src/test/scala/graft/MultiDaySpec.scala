package graft

import org.apache.spark.sql.functions._
import graft.build.{IndexBuilder, IndexConfig}
import graft.gen.TranscriptGen
import graft.query.{MultiDayEngine, QueryEngine, SearchQuery}

/** Multi-day scatter/gather (reference proxy J4 + daily epoch T5) and
  * pagination (O4). */
class MultiDaySpec extends SparkFunSuite {
  import spark.implicits._

  lazy val root: String = SparkSpec.tmpDir("graft-days")
  lazy val engines: MultiDayEngine = {
    // two disjoint "days" of turns, each its own index partition
    Seq("2026-01-01" -> (0L, 1500L), "2026-01-02" -> (1500L, 3000L)).foreach {
      case (day, (lo, hi)) =>
        val turns = spark.range(lo, hi, 1, 4).map(t => TranscriptGen.turnAt(t)).toDF()
        IndexBuilder.build(spark, turns, s"$root/day=$day",
          IndexConfig(buckets = 4, chunkDocs = 256))
    }
    new MultiDayEngine(spark,
      Seq("2026-01-01" -> s"$root/day=2026-01-01", "2026-01-02" -> s"$root/day=2026-01-02"))
  }

  test("multi-day topK unions per-day candidates and re-ranks globally") {
    val q = SearchQuery.of(Seq("text" -> Seq("error")), 10)
    val hits = engines.topK(q).collect()
    assert(hits.length == 10)
    val days = hits.map(_.getString(hits(0).fieldIndex("day"))).distinct
    assert(days.nonEmpty)
    // scores descend
    val scores = hits.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // per-day docIds restart from 0 (daily epoch, reference T5)
    val perDayStats = engines.engines.map(_._2.manifest.numDocs)
    assert(perDayStats == Seq(1500L, 1500L))
  }

  test("multi-day stats aggregate across days") {
    val q = SearchQuery.of(Seq("text" -> Seq("error")), 10)
    val st = engines.searchStats(q)
    val perDay = engines.engines.map(_._2.searchStats(q))
    assert(st.total == perDay.map(_.total).sum && st.pv == perDay.map(_.pv).sum)
    assert(st.total > 0)
  }

  test("pagination: page slices of the ranking are disjoint, ordered, exhaustive") {
    val e = engines.engines.head._2
    val q = SearchQuery.of(Seq("text" -> Seq("error")), 30)
    val all = e.topK(q).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val paged = (0 until 3).flatMap { p =>
      e.topKPage(q, p, 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    }
    assert(paged == all.take(paged.length))
  }
}
