package graft.tools

import org.apache.spark.sql.functions._
import graft.analyze.TextAnalyzer

/** A/B: interpreted tokensCol vs compiled tokensUdf on the build-hot
  * dl/avgdl scans (diagnostic main). Args: [turns] */
object TokAb {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(150000L)
    val spark = graft.Sessions.local(32, "tok-ab")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.gen.TranscriptGen.turns(spark, n).toDF()
      .localCheckpoint(true)
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[tokab] $name%-18s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    // alternate to cancel warm-up bias
    for (rep <- 1 to 2) {
      t(s"tokensCol#$rep")(docs.select(avg(size(TextAnalyzer.tokensCol(col("text"))))).collect())
      t(s"tokensUdf#$rep")(docs.select(avg(size(TextAnalyzer.tokensUdf(col("text"))))).collect())
    }
    spark.stop()
  }
}
