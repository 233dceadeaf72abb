package graft.tools

import graft.build.{IndexBuilder, IndexConfig}
import graft.gen.TranscriptGen

/** Runs just Bench's scaling section (diagnostic). */
object ScalingOnly {
  private def rm(dir: String): Unit = {
    def del(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(del); f.delete() }
    del(new java.io.File(dir))
  }
  def main(args: Array[String]): Unit = {
    val scaleTurns = 300000L
    def buildOnce(s: org.apache.spark.sql.SparkSession, n: Long, dir: String): Double = {
      rm(dir)
      val t0 = System.nanoTime()
      IndexBuilder.build(s, TranscriptGen.turns(s, n).toDF(), dir,
        IndexConfig(buckets = 32, chunkDocs = 1L << 14))
      (System.nanoTime() - t0) / 1e9
    }
    def measured(p: Int, reps: Int): Double = {
      val s = graft.Sessions.local(p, s"scaling-$p")
      s.sparkContext.setLogLevel("ERROR")
      buildOnce(s, 50000L, s"/tmp/graft-scale-warm-$p")
      val t = (1 to reps).map(_ => buildOnce(s, scaleTurns, s"/tmp/graft-scale-idx-$p")).min
      s.stop()
      t
    }
    val low = measured(1, 2)
    val high = measured(4, 3)
    val eff = ((scaleTurns / high) / (scaleTurns / low)) / 4.0
    println(f"[scaling] low=1c $low%.1fs high=4c $high%.1fs efficiency=$eff%.3f")
  }
}
