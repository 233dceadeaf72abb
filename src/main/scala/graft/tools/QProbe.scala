package graft.tools

import org.apache.spark.sql.SparkSession
import graft.query.{QueryEngine, SearchQuery}

/** Query-latency probe over an existing index under conf variants. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-bench-idx-32")
    val variants = Seq(
      ("aqe_on_sp32", true, 32),
      ("aqe_off_sp32", false, 32),
      ("aqe_off_sp8", false, 8),
      ("aqe_on_sp8", true, 8))
    val queries = graft.Bench.QuerySet
    variants.foreach { case (name, aqe, sp) =>
      val spark = SparkSession.builder()
        .master("local[32]")
        .appName(s"qprobe-$name")
        .config("spark.sql.adaptive.enabled", aqe.toString)
        .config("spark.sql.shuffle.partitions", sp.toString)
        .config("spark.local.dir", graft.Sessions.localDir)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val e = new QueryEngine(spark, dir)
      queries.foreach { case (_, q) => e.topK(q).collect() } // warm
      val times = (1 to 3).flatMap { _ =>
        queries.map { case (_, q) =>
          val t0 = System.nanoTime()
          e.topK(q).collect()
          (System.nanoTime() - t0) / 1e6
        }
      }.sorted
      println(f"[qprobe] $name: p50=${times(times.size / 2)}%.0fms max=${times.last}%.0fms")
      spark.stop()
    }
  }
}
