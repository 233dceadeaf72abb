package graft.ops

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession

/** Memoized on-disk IVF index per (sfDir, k) for the ann_ivf_* gate queries —
  * the GateIndex pattern: both gates probe the SAME persisted index + its
  * persisted quantizer the way a library user would, instead of re-running
  * the coarse-quantizer assignment per query (the build cost itself is
  * benchmarked separately: OpsScale's ivf_build member). Disk layout is
  * reused across JVMs when the row count still matches. */
object GateIvf {
  private val cache = new ConcurrentHashMap[String, (String, Array[(Int, Array[Float])])]()

  def index(spark: SparkSession, sfDir: String, k: Int): (String, Array[(Int, Array[Float])]) =
    cache.computeIfAbsent(s"$sfDir#$k", { _ =>
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val safe = sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
      val dir = s"/tmp/graft-gate-ivf/$safe-k$k"
      val fresh = try {
        spark.read.parquet(dir).count() == emb.count() &&
          IvfIndex.loadCentroids(spark, dir).nonEmpty
      } catch { case _: Throwable => false }
      if (fresh) (dir, IvfIndex.loadCentroids(spark, dir))
      else {
        graft.FsUtil.deleteRecursively(new java.io.File(dir))
        graft.FsUtil.deleteRecursively(new java.io.File(s"$dir-centroids"))
        (dir, IvfIndex.build(spark, emb, dir, k))
      }
    })
}
