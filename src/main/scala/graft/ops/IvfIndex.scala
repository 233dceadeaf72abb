package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-flat approximate-nearest-neighbor index — the coarse-quantizer scale
  * path complementing the sign-LSH buckets (AnnIndex): vectors are assigned
  * to their nearest CENTROID (inverted list) and the index table is
  * partitionBy(centroid); a query scans only its `nprobe` nearest centroids'
  * partitions. Centroid count scales as ~sqrt(n) (the classic IVF sizing),
  * so candidate volume per query is ~n/sqrt(n)*nprobe — sub-linear scan
  * with a tunable recall knob, where sign-LSH selectivity is fixed by bits.
  *
  * Centroids are DETERMINISTIC: the k lowest-vec_id vectors (a uniform
  * sample under hash-assigned ids). Production IVF would refine them with
  * Lloyd iterations; refinement only moves bucket boundaries — the
  * index/query contract (argmin-L2 assignment, nprobe probing, exact cosine
  * re-rank) is identical, and the deterministic choice keeps every stage
  * reproducible in the DuckDB oracle (FP-summation-order-free).
  */
object IvfIndex {

  /** L2 distance^2 between an embedding column and a constant centroid,
    * folded as a literal array (dim-ascending sum, 0.0 init — the exact FP
    * shape the oracle reproduces). */
  private def dist2(emb: Column, centroid: Array[Float]): Column = {
    val cArr = array(centroid.map(v => lit(v.toDouble)): _*)
    aggregate(
      zip_with(emb, cArr, (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
      lit(0.0), (acc, v) => acc + v)
  }

  /** The k lowest-vec_id vectors as centroids: (centroidId 0..k-1 in vec_id
    * order, vector). */
  def centroids(emb: DataFrame, k: Int): Array[(Int, Array[Float])] =
    emb.select(col("vec_id"), col("embedding"))
      .orderBy("vec_id").limit(k).collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1).toArray) }

  /** df + `centroid` column = argmin-L2 over the centroids; ties break to
    * the lower centroid id (first match wins in the coalesce). Distances
    * materialize as k intermediate columns referenced by ATTRIBUTE — a
    * naive when()-fold nests the running best twice per step and blows the
    * expression tree up 2^k (Catalyst analysis hangs at k=16). */
  def withCentroid(df: DataFrame, embCol: String,
                   cents: Array[(Int, Array[Float])]): DataFrame = {
    if (cents.isEmpty) return df.withColumn("centroid", lit(0))
    val dNames = cents.map { case (i, _) => s"_ivf_d$i" }
    val withD = df.select(col("*") +: cents.map { case (i, c) =>
      dist2(col(embCol), c).as(s"_ivf_d$i")
    }: _*)
    val m = if (dNames.length == 1) col(dNames.head)
            else least(dNames.map(col): _*)
    val pick = coalesce(cents.map { case (i, _) =>
      when(col(s"_ivf_d$i") === m, lit(i))
    }: _*)
    withD.withColumn("centroid", pick).drop(dNames: _*)
  }

  /** Build the inverted-file table at `dir` (partitionBy(centroid)). */
  def build(spark: SparkSession, embeddings: DataFrame, dir: String, k: Int): Unit = {
    val cents = centroids(embeddings, k)
    withCentroid(embeddings, "embedding", cents)
      .write.mode("overwrite").partitionBy("centroid").parquet(dir)
  }

  /** Driver-side assignment of one vector (same fold order as assignCol). */
  def nearestCentroids(v: Array[Float], cents: Array[(Int, Array[Float])], nprobe: Int): Seq[Int] =
    cents.map { case (i, c) =>
      var d = 0.0; var j = 0
      while (j < v.length) { val t = v(j).toDouble - c(j).toDouble; d += t * t; j += 1 }
      (i, d)
    }.sortBy { case (i, d) => (d, i) }.take(nprobe).map(_._1).toSeq

  /** All candidates in the nprobe nearest centroids' partitions, with exact
    * cosine — no ordering or cut, so callers control the tie-break contract
    * (the gate rounds BEFORE ordering to match its oracle exactly). */
  def queryCandidates(spark: SparkSession, dir: String, cents: Array[(Int, Array[Float])],
                      queryVec: Array[Float], nprobe: Int): DataFrame = {
    val probes = nearestCentroids(queryVec, cents, nprobe)
    val qNorm = math.sqrt(queryVec.map(v => v.toDouble * v.toDouble).sum)
    val qLit = array(queryVec.map(v => lit(v.toDouble)): _*)
    spark.read.parquet(dir)
      .filter(col("centroid").isin(probes: _*)) // partition pruning
      .select(col("vec_id"), col("label"), col("centroid"), col("embedding"), qLit.as("qv"))
      .withColumn("dot", expr(
        "aggregate(zip_with(embedding, qv, (a, b) -> CAST(a AS DOUBLE) * b), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))
      .withColumn("norm", expr(
        "sqrt(aggregate(embedding, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"))
      .withColumn("cos", col("dot") / (col("norm") * lit(qNorm)))
      .select(col("vec_id"), col("label"), col("centroid"), col("cos"))
  }

  /** Top-k by cosine among the nprobe nearest centroids' partitions only. */
  def query(spark: SparkSession, dir: String, cents: Array[(Int, Array[Float])],
            queryVec: Array[Float], k: Int, nprobe: Int): DataFrame =
    queryCandidates(spark, dir, cents, queryVec, nprobe)
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)

  /** Centroid histogram — gate-query surface (mirrors lshBuckets). */
  def ivfBuckets(spark: SparkSession, sfDir: String, k: Int): DataFrame = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    if (Similarity.dimOf(emb).isEmpty)
      return emb.limit(0).select(lit(0).as("centroid"), lit(0L).as("n"),
        col("vec_id").as("min_vec"))
    val cents = centroids(emb, k)
    withCentroid(emb, "embedding", cents)
      .groupBy("centroid").agg(count(lit(1)).as("n"), min("vec_id").as("min_vec"))
      .orderBy("centroid")
  }
}
