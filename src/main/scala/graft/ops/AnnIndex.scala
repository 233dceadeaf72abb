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
/** Tuning for the hyperplane-LSH ANN family. `sigBits` sets the bucket count
  * (2^bits) — the SELECTIVITY knob that must scale with the corpus: expected
  * candidate volume of a same-bucket join is Σ bucket² ≈ n²/2^bits, so bits
  * should grow ~2·log2(n) − const (8 bits serves ~10⁵-10⁶ vectors; 10⁹ wants
  * ~20+, or a two-level IVF). `probeHamming` is the query-time RECALL knob:
  * probe every bucket within that Hamming distance of the query signature.
  * Defaults preserve the oracle-matched round-1/2 behavior. */
final case class AnnConfig(sigBits: Int = Similarity.SigBits, probeHamming: Int = 1) {
  require(sigBits >= 1 && sigBits <= 30, s"sigBits $sigBits out of range")
  require(probeHamming >= 0 && probeHamming <= sigBits, s"probeHamming $probeHamming out of range")
}

object AnnIndex {

  val SigBits: Int = Similarity.SigBits // default: 8 -> 256 buckets

  /** Signature bucket of an embedding column (array<float>, `dim` wide). */
  def bucketCol(emb: String, dim: Int, cfg: AnnConfig = AnnConfig()): org.apache.spark.sql.Column =
    Hyperplanes.bucketUdf(cfg.sigBits, dim)(col(emb))

  /** Build the bucketed index table at `dir` (partitionBy(bucket)). */
  def build(spark: SparkSession, embeddings: DataFrame, dir: String,
            cfg: AnnConfig = AnnConfig()): Unit = {
    val bucket = Similarity.dimOf(embeddings) match {
      case Some(dim) => bucketCol("embedding", dim, cfg)
      case None => lit(0) // empty input: schema-stable empty index
    }
    embeddings
      .withColumn("bucket", bucket)
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
  }

  /** Probe buckets for a query signature: own bucket first, then every
    * signature within Hamming distance cfg.probeHamming. */
  def probeBuckets(sig: Int, cfg: AnnConfig = AnnConfig()): Seq[Int] = {
    def flips(base: Int, startBit: Int, remaining: Int): Seq[Int] =
      if (remaining == 0) Seq(base)
      else base +: (startBit until cfg.sigBits).flatMap(j =>
        flips(base ^ (1 << j), j + 1, remaining - 1))
    flips(sig, 0, cfg.probeHamming).distinct
  }

  /** Top-k by cosine among the probe buckets only (partition-pruned scan).
    * `cfg` must match the one the index was built with. */
  def query(spark: SparkSession, dir: String, queryVec: Array[Float], k: Int,
            cfg: AnnConfig = AnnConfig()): DataFrame = {
    val sig = Hyperplanes.signatureOf(queryVec, cfg.sigBits)
    val probes = probeBuckets(sig, cfg)

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
