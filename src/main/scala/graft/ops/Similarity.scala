package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (vec_id, embedding:
  * array<float>, label).
  *
  * Brute-force cosine top-k is the exact baseline (one pass, no shuffle
  * besides the final top-k tree-reduce — at 100 TB this is a full scan, which
  * is why the LSH-bucketed variant exists: random-hyperplane signatures
  * bucket the vectors so a query probes only its own bucket's partitions).
  */
object Similarity {

  /** dot/norm computed in double via codegen'd higher-order functions. */
  private def dotCols = expr(
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
  private def norm(c: String) = expr(
    s"sqrt(aggregate($c, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))")

  /** Exact cosine top-k of `queryVecId`'s embedding against all others. */
  def cosineTopK(spark: SparkSession, sfDir: String, queryVecId: Long, k: Int): DataFrame = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("b"))
    emb.filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), col("label"), col("embedding").as("a"))
      .crossJoin(broadcast(q))
      .withColumn("cos", round(dotCols / (norm("a") * norm("b")), 6))
      .select(col("vec_id"), col("label"), col("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
  }

  /** Embedding-cosine near-dup pairs: all (a, b) with cosine >= threshold —
    * the embedding member of the dedup family (brute-force exact; the
    * AnnIndex bucket join is the 100 TB candidate-generation path). */
  def embedDupPairs(spark: SparkSession, sfDir: String, threshold: Double): DataFrame = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val p = math.max(64, spark.sessionState.conf.numShufflePartitions)
    val a = emb.repartition(p)
      .select(col("vec_id").as("a"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("b"), col("embedding").as("eb"))
    a.join(broadcast(b), col("a") < col("b"))
      .withColumn("dot", expr(
        "aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))
      .withColumn("na", expr(
        "sqrt(aggregate(ea, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"))
      .withColumn("nb", expr(
        "sqrt(aggregate(eb, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"))
      .withColumn("cos", col("dot") / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
      .orderBy("a", "b")
  }

  /** Scale path: random-hyperplane LSH bucketing. Hyperplane h(j, d) =
    * deterministic ±1 from the md5-based bit of (j, d) — signature = 8-bit
    * signs of the dot products. Query probes only its bucket (and the result
    * reports bucket sizes — the data needed to reason about recall/probe
    * trade-offs). Signs are integer-exact, so the oracle reproduces them.
    */
  val SigBits = 8

  def lshBuckets(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // ±1 hyperplanes: sign from a parity-of-md5 bit per (j, dim)
    val sig = (0 until SigBits).map { j =>
      // dot_j = Σ_d emb[d] * s(j,d), s = +1 if md5(j:d) lowest bit of first
      // hex nibble is even else -1 — computable identically in SQL
      val terms = expr(
        s"""aggregate(
           |  zip_with(embedding, sequence(0, size(embedding) - 1),
           |    (v, d) -> CAST(v AS DOUBLE) *
           |      CASE WHEN CAST(conv(substr(md5(concat('hp-$j-', CAST(d AS STRING))), 1, 1), 16, 10) AS INT) % 2 = 0
           |           THEN 1.0 ELSE -1.0 END),
           |  CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)
      when(terms > 0, 1).otherwise(0).as(s"bit$j")
    }
    val withBits = emb.select((col("vec_id") +: sig): _*)
    val bucket = (0 until SigBits).map(j => col(s"bit$j") * (1 << j)).reduce(_ + _)
    withBits.select(col("vec_id"), bucket.as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"), min("vec_id").as("min_vec"))
      .orderBy("bucket")
  }
}
