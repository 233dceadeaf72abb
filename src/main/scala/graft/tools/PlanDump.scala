package graft.tools

import java.nio.file.{Files, Path}

/** Dumps `.explain("formatted")` of selected SparkEntry gate queries to
  * text files — the before/after plan evidence for optimization rounds
  * (plans/r06/<query>_<suffix>.txt). Diagnostic main; not part of the
  * bench contract. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r06")
    val spark = graft.Sessions.local(cpus, "graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    Files.createDirectories(Path.of(outDir))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val s = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.write(Path.of(outDir, s"${name}_$suffix.txt"), s.getBytes("UTF-8"))
        println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
      } catch { case e: Throwable => System.err.println(s"[plandump] $name: $e") }
    }
    spark.stop()
  }
}
