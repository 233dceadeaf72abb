package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
      .crossJoin(broadcast(q)) // one k-element row — broadcast is the right call
      .withColumn("cos", round(dotCols / (norm("a") * norm("b")), 6))
      .select(col("vec_id"), col("label"), col("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
  }

  /** Exact cosine of two raw float vectors with the oracle's exact FP shape:
    * per-accumulator left fold over dims in double (0.0 init adds exactly). */
  private[ops] def cosineOf(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var d = 0
    while (d < a.length) {
      val x = a(d).toDouble; val y = b(d).toDouble
      dot += x * y; na += x * x; nb += y * y
      d += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Floor for the all-pairs block count. */
  private[ops] val DefaultPairBlocks = 8

  /** Embedding-cosine near-dup pairs: all (a, b) with cosine >= threshold —
    * the embedding member of the dedup family.
    *
    * Exact all-pairs made distributed: vectors partition into B blocks by
    * vec_id; each block ships to its B pair-groups (ONE shuffle, volume
    * B x data — no broadcast, no O(n^2) nested-loop join operator), and a
    * compiled float kernel scores each pair. Exact all-pairs is inherently
    * O(n^2) compares; this is its scale-safe shape — when exactness can be
    * traded, AnnIndex's bucket join generates candidates sub-quadratically.
    */
  def embedDupPairs(spark: SparkSession, sfDir: String, threshold: Double,
                    blocks: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val items: Dataset[(Long, Array[Float])] = spark.read
      .parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    // B from input size (results are B-invariant — OpsSpec asserts it);
    // block ≈ Dedup.TargetRowsPerBlock rows = the per-task buffer bound
    val B = blocks.getOrElse(Dedup.pairBlocksFor(items.count(), DefaultPairBlocks))

    val tagged = items.flatMap { case (id, v) =>
      val blk = (id % B).toInt
      (0 until B).iterator.map { o =>
        val i = math.min(blk, o); val j = math.max(blk, o)
        (i * B + j, blk, id, v)
      }
    }
    val thr = threshold
    tagged
      .groupByKey(_._1)
      // sorted by block id: buffer block i only, stream block j (per-task
      // memory = one block, regardless of corpus size)
      .flatMapSortedGroups($"_2") { (pid: Int, it: Iterator[(Int, Int, Long, Array[Float])]) =>
        val i = pid / B
        def scored(x: (Long, Array[Float]), y: (Long, Array[Float])): Iterator[(Long, Long, Double)] = {
          val c = cosineOf(x._2, y._2)
          if (c >= thr) Iterator.single((math.min(x._1, y._1), math.max(x._1, y._1), c))
          else Iterator.empty
        }
        if (i == pid % B) { // diagonal: within-block pairs
          val xs = it.map { case (_, _, id, v) => (id, v) }.toArray
          xs.indices.iterator.flatMap { p =>
            (p + 1 until xs.length).iterator.flatMap(q => scored(xs(p), xs(q)))
          }
        } else {
          val buf = scala.collection.mutable.ArrayBuffer[(Long, Array[Float])]()
          val bi = it.buffered
          while (bi.hasNext && bi.head._2 == i) { val r = bi.next(); buf += ((r._3, r._4)) }
          bi.flatMap { case (_, _, id, v) => buf.iterator.flatMap(x => scored(x, (id, v))) }
        }
      }
      .toDF("a", "b", "cos_raw")
      .select(col("a"), col("b"), round(col("cos_raw"), 6).as("cos"))
      .orderBy("a", "b")
  }

  /** Sub-quadratic embedding near-dup — AnnIndex's hyperplane buckets as
    * CANDIDATE GENERATION (same-bucket equi-join; the join key is the
    * signature, so candidate volume is sum of squared bucket sizes, not
    * n^2), verified with exact cosine. Approximate by construction: pairs
    * whose signatures differ are missed — `embedDupPairs` above is the
    * oracle-checked exact form; this is the shape that survives 10^9
    * vectors. Multi-probe (Hamming-1 bucket unioning, as in AnnIndex.query)
    * is the recall knob. */
  def embedDupPairsAnn(spark: SparkSession, sfDir: String, threshold: Double,
                       cfg: AnnConfig = AnnConfig()): DataFrame = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dim = dimOf(emb).getOrElse(
      return emb.limit(0).select(col("vec_id").as("a"), col("vec_id").as("b"),
        lit(0).as("bucket"), lit(0.0).as("cos")))
    val bucketed = emb.select(col("vec_id"), col("embedding"),
      Hyperplanes.bucketCol(col("embedding"), cfg.sigBits, dim).as("bucket"))
    val x = bucketed.select(col("bucket"), col("vec_id").as("a"), col("embedding").as("ea"))
    val y = bucketed.select(col("bucket"), col("vec_id").as("b"), col("embedding").as("eb"))
    x.join(y, Seq("bucket")).filter(col("a") < col("b"))
      .withColumn("dot", expr(
        "aggregate(zip_with(ea, eb, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))
      .withColumn("na", expr(
        "sqrt(aggregate(ea, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"))
      .withColumn("nb", expr(
        "sqrt(aggregate(eb, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"))
      .withColumn("cos", col("dot") / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), col("bucket"), round(col("cos"), 6).as("cos"))
      .orderBy("a", "b")
  }

  /** Random-hyperplane LSH bucket histogram — signature = SigBits sign bits
    * of dot(v, h_j) with the shared Hyperplanes constant matrix (the md5-
    * derived ±1 signs are integer-exact, so the oracle reproduces them). */
  val SigBits = 8

  /** Embedding width, or None for an empty table (the callers return a
    * schema-stable empty frame instead of throwing on head()). */
  private[ops] def dimOf(emb: DataFrame): Option[Int] =
    emb.select(size(col("embedding"))).limit(1).collect().headOption.map(_.getInt(0))

  def lshBuckets(spark: SparkSession, sfDir: String,
                 cfg: AnnConfig = AnnConfig()): DataFrame = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dim = dimOf(emb).getOrElse(
      return emb.limit(0).select(lit(0).as("bucket"), lit(0L).as("n"),
        col("vec_id").as("min_vec")))
    emb.select(col("vec_id"),
        Hyperplanes.bucketCol(col("embedding"), cfg.sigBits, dim).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"), min("vec_id").as("min_vec"))
      .orderBy("bucket")
  }
}
