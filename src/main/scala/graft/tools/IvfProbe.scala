package graft.tools

import org.apache.spark.sql.functions._

/** Phase-timing probe for the cold ann_ivf_* gate path (GateIvf build +
  * first query) — diagnostic main. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.Sessions.local(cpus, "graft-ivfprobe")
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[ivfprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      a
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    t("warm-read")(emb.count())
    val fp = t("fingerprint")(emb.selectExpr("count(*) AS n",
      "bit_xor(xxhash64(vec_id, CAST(embedding[0] AS STRING))) AS fp").collect()(0))
    val cents = t("centroids-collect")(graft.ops.IvfIndex.centroids(emb, 16))
    val dir = "/tmp/graft-ivfprobe-idx"
    graft.FsUtil.deleteRecursively(new java.io.File(dir))
    graft.FsUtil.deleteRecursively(new java.io.File(s"$dir-centroids"))
    val assigned = graft.ops.IvfIndex.withCentroid(emb, "embedding", cents)
    t("assign+write") {
      assigned.repartition(col("centroid"))
        .write.mode("overwrite").partitionBy("centroid").parquet(dir)
    }
    t("centroids-write")(graft.ops.IvfIndex.writeCentroids(dir, cents))
    t("gate-query") {
      spark.read.parquet(dir)
        .groupBy("centroid").agg(count(lit(1)).as("n"), min("vec_id").as("min_vec"))
        .orderBy("centroid").count()
    }
    t("gate-query-2nd") {
      spark.read.parquet(dir)
        .groupBy("centroid").agg(count(lit(1)).as("n"), min("vec_id").as("min_vec"))
        .orderBy("centroid").count()
    }
    spark.stop()
  }
}
