package graft.tools

/** Times selected SparkEntry gate queries (diagnostic main). */
object GateTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Sessions.local(cpus, "graft-gatetime")
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = try graft.SparkEntry.queries(name)(spark, sfDir).count()
              catch { case e: Throwable => System.err.println(s"$name: $e"); -1L }
      println(f"[gatetime] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs ($n rows)")
    }
    spark.stop()
  }
}
