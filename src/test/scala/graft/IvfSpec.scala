package graft

import org.apache.spark.sql.functions._
import graft.ops.{IvfIndex, Similarity}

/** IVF-flat ANN: deterministic coarse quantizer, partition pruning, recall. */
class IvfSpec extends SparkFunSuite {

  val sf = "/root/testdata/sf0.01"
  val K = 16
  lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  lazy val cents = IvfIndex.centroids(emb, K)
  lazy val dir: String = {
    val d = SparkSpec.tmpDir("graft-ivf")
    IvfIndex.build(spark, emb, d, K)
    d
  }

  test("inverted lists partition all vectors across k centroids") {
    val n = spark.read.parquet(dir).count()
    assert(n == emb.count())
    val hist = IvfIndex.ivfBuckets(spark, sf, K).collect()
    assert(hist.map(_.getLong(1)).sum == n)
    assert(hist.forall(r => r.getInt(0) >= 0 && r.getInt(0) < K))
    // column-form assignment == driver-side assignment (same fold order)
    val colAssign = spark.read.parquet(dir).select("vec_id", "centroid").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    emb.select("vec_id", "embedding").collect().take(50).foreach { r =>
      val drv = IvfIndex.nearestCentroids(r.getSeq[Float](1).toArray, cents, 1).head
      assert(colAssign(r.getLong(0)) == drv, s"vec ${r.getLong(0)}")
    }
  }

  test("query scan is partition-pruned to nprobe inverted lists") {
    val q = emb.filter(col("vec_id") === 2L).collect()(0).getSeq[Float](1).toArray
    val df = IvfIndex.query(spark, dir, cents, q, 10, nprobe = 4)
    df.collect()
    val parts = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(parts.exists(_ <= 4), s"scanned $parts partitions")
  }

  test("IVF recall@10 >= scanned coverage (isotropic-vector floor, like AnnIndexSpec)") {
    val total = emb.count().toDouble
    val qs = emb.filter(col("vec_id") < 5).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val (recalls, coverages) = qs.map { case (qid, vec) =>
      val exact = Similarity.cosineTopK(spark, sf, qid, 10).collect().map(_.getLong(0)).toSet
      val probed = IvfIndex.query(spark, dir, cents, vec, 11, nprobe = 4).collect()
      val approx = probed.map(_.getLong(0)).filter(_ != qid).take(10).toSet
      val probes = IvfIndex.nearestCentroids(vec, cents, 4)
      val scanned = spark.read.parquet(dir).filter(col("centroid").isin(probes: _*)).count().toDouble
      ((exact intersect approx).size.toDouble / exact.size, scanned / total)
    }.unzip
    val meanR = recalls.sum / recalls.length
    val meanC = coverages.sum / coverages.length
    assert(meanR >= meanC, f"mean recall $meanR%.3f below coverage $meanC%.3f")
  }
}
