package graft.ops

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession

/** Memoized on-disk IVF index per (sfDir, k) for the ann_ivf_* gate queries —
  * the GateIndex pattern: both gates probe the SAME persisted index + its
  * persisted quantizer the way a library user would, instead of re-running
  * the coarse-quantizer assignment per query (the build cost itself is
  * benchmarked separately: OpsScale's ivf_build member). Disk layout is
  * reused across JVMs only when BOTH the row count and the version stamp
  * match — /tmp indexes outlive code versions, and a quantizer-seeding or
  * layout change must rebuild, not silently serve stale lists (the same
  * reason GateIndex checks its buildId prefix). */
object GateIvf {

  /** Bump on ANY change to IVF seeding, assignment, or layout. */
  private val Version = 3

  private val cache = new ConcurrentHashMap[String, (String, Array[(Int, Array[Float])])]()

  def index(spark: SparkSession, sfDir: String, k: Int): (String, Array[(Int, Array[Float])]) =
    cache.computeIfAbsent(s"$sfDir#$k", { _ =>
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      // content fingerprint, not just the row count: an embeddings.parquet
      // regenerated in place with the SAME row count but different vectors
      // must rebuild, not serve a stale /tmp index across JVMs (round-4
      // ADVICE). One slim agg: xxhash64 over (vec_id, first dimension).
      val fpRow = emb.selectExpr(
        "count(*) AS n",
        // bit_xor, not sum: order-independent AND overflow-free under ANSI
        "bit_xor(xxhash64(vec_id, CAST(embedding[0] AS STRING))) AS fp").collect()(0)
      val n = fpRow.getLong(0)
      val fp = if (fpRow.isNullAt(1)) 0L else fpRow.getLong(1)
      val safe = sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
      val dir = s"/tmp/graft-gate-ivf/$safe-k$k"
      if (n == 0L) (dir, Array.empty[(Int, Array[Float])]) // empty corpus
      else {
        val stampFile = new java.io.File(s"$dir-stamp")
        val stamp = s"gateivf-v$Version-k$k-n$n-fp$fp"
        val fresh = try {
          stampFile.exists() &&
            new String(java.nio.file.Files.readAllBytes(stampFile.toPath), "UTF-8") == stamp &&
            spark.read.parquet(dir).count() == n &&
            IvfIndex.loadCentroids(spark, dir).nonEmpty
        } catch { case _: Throwable => false }
        if (fresh) (dir, IvfIndex.loadCentroids(spark, dir))
        else {
          graft.FsUtil.deleteRecursively(new java.io.File(dir))
          graft.FsUtil.deleteRecursively(new java.io.File(s"$dir-centroids"))
          new java.io.File(s"$dir-centroids.bin").delete()
          stampFile.delete()
          val cents = IvfIndex.build(spark, emb, dir, k)
          java.nio.file.Files.createDirectories(stampFile.toPath.getParent)
          java.nio.file.Files.write(stampFile.toPath, stamp.getBytes("UTF-8"))
          (dir, cents)
        }
      }
    })
}
