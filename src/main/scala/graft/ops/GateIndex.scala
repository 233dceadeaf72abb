package graft.ops

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession
import graft.build.{IndexBuilder, IndexConfig}
import graft.query.QueryEngine

/** Memoized real on-disk index per sfDir for the driver-gate queries: the
  * ft_* gate entries run through the SAME persisted index + QueryEngine a
  * user of the library would (not an ad-hoc DataFrame re-derivation).
  */
object GateIndex {
  private val cache = new ConcurrentHashMap[String, QueryEngine]()

  def engine(spark: SparkSession, sfDir: String): QueryEngine =
    cache.computeIfAbsent(sfDir, { _ =>
      val safe = sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
      val dir = s"/tmp/graft-gate-index/$safe"
      val turns = Transcripts.fromDocuments(spark, sfDir)
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
      // rebuild if absent or stale (different corpus size)
      val needBuild = try {
        val m = IndexBuilder.readManifest(spark, dir)
        m.numDocs != turns.count() ||
          !m.buildId.startsWith(s"build-v${IndexBuilder.LayoutVersion}-")
      } catch { case _: Throwable => true }
      if (needBuild) {
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(dir), true)
        IndexBuilder.build(spark, turns, dir,
          IndexConfig(buckets = 16, chunkDocs = 1024, blockSize = 64))
      }
      new QueryEngine(spark, dir)
    })
}
