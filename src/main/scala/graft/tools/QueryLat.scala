package graft.tools

import org.apache.spark.sql.SparkSession
import graft.query.QueryEngine

/** Serving-path latency on an arbitrary index (diagnostic): Bench's exact
  * AQE-off serving profile + warm plan-cache loop (5 reps/query, mean +
  * percentiles over all reps) — the number a resident query service sees.
  * LatProbe is the complementary UNCACHED breakdown. Args: [indexDir]. */
object QueryLat {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-bench-idx-32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("querylat")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", graft.Sessions.localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = new QueryEngine(spark, dir)
    graft.Bench.QuerySet.foreach { case (_, q) => e.topK(q).collect() } // warm
    val all = scala.collection.mutable.ArrayBuffer[Double]()
    graft.Bench.QuerySet.foreach { case (name, q) =>
      val reps = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        e.topK(q).collect()
        (System.nanoTime() - t0) / 1e6
      }
      all ++= reps
      println(f"[querylat] $name%-18s mean=${reps.sum / reps.size}%7.1fms reps=${reps.map(r => f"$r%.0f").mkString(",")}")
    }
    val s = all.sorted
    println(f"[querylat] p50=${s(s.size / 2)}%.1fms p99=${s(((s.size - 1) * 0.99).round.toInt)}%.1fms")
    spark.stop()
  }
}
