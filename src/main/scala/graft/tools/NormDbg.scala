package graft.tools

import org.apache.spark.sql.functions._

object NormDbg {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(8, "normdbg")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val turns = graft.gen.TranscriptGen.turns(spark, 3000, 4).toDF()
    val (docs, handle, _) = graft.build.DocIds.assignWithHandle(turns, 0)
    val chunkDocs = 256L
    val dlRows = Seq("text", "role", "tool").map { f =>
      val toks = f match {
        case "text" => graft.analyze.TextAnalyzer.tokensCol(col("text"))
        case x => graft.analyze.KeywordAnalyzer.tokensCol(col(x))
      }
      docs.select(lit(f).as("field"), (col("docId") / chunkDocs).cast("long").as("chunk"),
        col("docId"), size(toks).as("dl"))
    }.reduce(_ unionAll _)
    println("=== dlRows counts per field/chunk ===")
    dlRows.groupBy("field", "chunk").count().orderBy("field", "chunk").show(50)
    println("=== grouped via groupByKey ===")
    val g = dlRows.as[(String, Long, Long, Int)].groupByKey(r => (r._1, r._2))
      .mapGroups { (k: (String, Long), it: Iterator[(String, Long, Long, Int)]) =>
        (k._1, k._2, it.size)
      }.toDF("field", "chunk", "n")
    g.orderBy("field", "chunk").show(50)
    spark.stop()
  }
}
