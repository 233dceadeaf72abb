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
  * Random-hyperplane signatures: bit j = sign(v . h_j), h_j[d] = ±1 derived
  * from md5("hp-j-d") — deterministic, data-independent, so index and query
  * agree with no stored model. Multi-probe: query probes its own bucket plus
  * all Hamming-1 neighbors (flipping low-confidence bits first would be the
  * next refinement).
  */
object AnnIndex {

  val SigBits: Int = Similarity.SigBits // 8 -> 256 buckets

  /** ±1 hyperplane sign for (bit j, dim d) — must match the SQL oracle. */
  private def signExpr(j: Int): String =
    s"""CASE WHEN CAST(conv(substr(md5(concat('hp-$j-', CAST(x2 AS STRING))), 1, 1), 16, 10) AS INT) % 2 = 0
       |     THEN 1.0 ELSE -1.0 END""".stripMargin

  /** Signature bucket of an embedding column (array<float>). */
  def bucketCol(emb: String): org.apache.spark.sql.Column = {
    val bits = (0 until SigBits).map { j =>
      val dot = expr(
        s"""aggregate(zip_with($emb, sequence(0, size($emb) - 1),
           |  (x1, x2) -> CAST(x1 AS DOUBLE) * ${signExpr(j)}),
           |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)
      when(dot > 0, 1 << j).otherwise(0)
    }
    bits.reduce(_ + _)
  }

  /** Build the bucketed index table at `dir` (partitionBy(bucket)). */
  def build(spark: SparkSession, embeddings: DataFrame, dir: String): Unit = {
    embeddings
      .withColumn("bucket", bucketCol("embedding"))
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
  }

  /** Probe buckets for a query signature: own bucket + Hamming-1 ring. */
  def probeBuckets(sig: Int): Seq[Int] =
    sig +: (0 until SigBits).map(j => sig ^ (1 << j))

  /** Top-k by cosine among the probe buckets only (partition-pruned scan). */
  def query(spark: SparkSession, dir: String, queryVec: Array[Float], k: Int): DataFrame = {
    // driver-side signature of the query vector (same hyperplanes)
    val sig = (0 until SigBits).map { j =>
      var dot = 0.0
      var d = 0
      while (d < queryVec.length) {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"hp-$j-$d".getBytes("UTF-8"))
        val nibble = (hex(0) >> 4) & 0xf
        dot += queryVec(d).toDouble * (if (nibble % 2 == 0) 1.0 else -1.0)
        d += 1
      }
      if (dot > 0) 1 << j else 0
    }.sum
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
