package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LSH-bucketed approximate-nearest-neighbor index — the scale path for
  * similarity search over an embedding column (brute force in `Similarity`
  * is the exact baseline; at 100 TB a full scan per query is the problem the
  * bucket layout solves: the index table is `partitionBy(bucket)`, a query
  * reads only its probe buckets' partitions — the same pruning shape as the
  * posting table's term buckets).
  *
  * Signatures come from the shared `Hyperplanes` constant sign matrix
  * (computed once on the driver, constant-folded into the plan) — index and
  * query agree with no stored model. Multi-probe: query probes its own
  * bucket plus all Hamming-1 neighbors (flipping low-confidence bits first
  * would be the next refinement).
  */
object AnnIndex {

  val SigBits: Int = Similarity.SigBits // 8 -> 256 buckets

  /** Signature bucket of an embedding column (array<float>, `dim` wide). */
  def bucketCol(emb: String, dim: Int): org.apache.spark.sql.Column =
    Hyperplanes.bucketCol(col(emb), SigBits, dim)

  /** Build the bucketed index table at `dir` (partitionBy(bucket)). */
  def build(spark: SparkSession, embeddings: DataFrame, dir: String): Unit = {
    val bucket = Similarity.dimOf(embeddings) match {
      case Some(dim) => bucketCol("embedding", dim)
      case None => lit(0) // empty input: schema-stable empty index
    }
    embeddings
      .withColumn("bucket", bucket)
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
  }

  /** Probe buckets for a query signature: own bucket + Hamming-1 ring. */
  def probeBuckets(sig: Int): Seq[Int] =
    sig +: (0 until SigBits).map(j => sig ^ (1 << j))

  /** Top-k by cosine among the probe buckets only (partition-pruned scan). */
  def query(spark: SparkSession, dir: String, queryVec: Array[Float], k: Int): DataFrame = {
    val sig = Hyperplanes.signatureOf(queryVec, SigBits)
    val probes = probeBuckets(sig)

    val qNorm = math.sqrt(queryVec.map(v => v.toDouble * v.toDouble).sum)
    val qLit = array(queryVec.map(v => lit(v.toDouble)): _*)
    spark.read.parquet(dir)
      .filter(col("bucket").isin(probes: _*)) // partition pruning
      .select(col("vec_id"), col("label"), col("bucket"), col("embedding"), qLit.as("qv"))
      .withColumn("dot", expr(
        "aggregate(zip_with(embedding, qv, (a, b) -> CAST(a AS DOUBLE) * b), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))
      .withColumn("norm", expr(
        "sqrt(aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"))
      .withColumn("cos", col("dot") / (col("norm") * lit(qNorm)))
      .select(col("vec_id"), col("label"), col("bucket"), col("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
  }
}
