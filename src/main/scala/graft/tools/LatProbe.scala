package graft.tools

import org.apache.spark.sql.SparkSession
import graft.query.QueryEngine

/** Interactive-latency breakdown (diagnostic): splits each query rep into
  * DataFrame construction, Catalyst analysis+planning, and execution, to
  * show where the per-query floor lives. Args: [indexDir]. */
object LatProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-bench-idx-32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("latprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", graft.Sessions.localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = new QueryEngine(spark, dir)
    graft.Bench.QuerySet.foreach { case (_, q) => e.topK(q).collect() } // warm
    graft.Bench.QuerySet.foreach { case (name, q) =>
      val reps = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        // topKUncached: bypass the plan cache, else build/plan measure a
        // map lookup instead of the construction cost this probe exists for
        val df = e.topKUncached(q)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis + optimization + planning
        val t2 = System.nanoTime()
        df.collect()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e6, (t2 - t1) / 1e6, (t3 - t2) / 1e6)
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"[latprobe] $name%-18s build=${med(reps.map(_._1))}%6.1fms " +
        f"plan=${med(reps.map(_._2))}%6.1fms exec=${med(reps.map(_._3))}%6.1fms")
    }
    // serving-path comparison with ALL caches warm: cached top-k (plan
    // cache) vs the stats path (count memo) — the round-5 check that
    // pv/uv stats serve at the same interactive floor as top-k
    def med2(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    graft.Bench.QuerySet.foreach { case (name, q) =>
      e.searchStats(q) // warm the count memo
      val tk = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); e.topK(q).collect(); (System.nanoTime() - t0) / 1e6
      }
      val st = (1 to 7).map { _ =>
        val t0 = System.nanoTime(); e.searchStats(q); (System.nanoTime() - t0) / 1e6
      }
      println(f"[latprobe] warm $name%-13s topk=${med2(tk)}%6.1fms stats=${med2(st)}%6.2fms")
    }
    spark.stop()
  }
}
