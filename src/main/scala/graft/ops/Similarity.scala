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

  /** Compiled cosine of two float vectors as a UDF — Spark evaluates the
    * former `aggregate(zip_with(...))` higher-order lambdas INTERPRETED per
    * element, which dominated the scan (guide §1.2 per-task work). FP shape
    * is unchanged and oracle-identical: dim-ascending double folds with 0.0
    * init (widen-then-multiply), cos grouped as dot / (‖a‖·‖b‖) — exactly
    * [[cosineOf]], which the block-pair kernel has always used. */
  private val cosineUdf = udf { (a: Seq[Float], b: Seq[Float]) =>
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var d = 0
    while (d < a.length) {
      val x = a(d).toDouble; val y = b(d).toDouble
      dot += x * y; na += x * x; nb += y * y
      d += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Exact cosine top-k of `queryVecId`'s embedding against all others.
    * The query vector is collected driver-side and rides into the kernel
    * closure (the IvfIndex.queryCandidates shape) instead of the previous
    * 1-row crossJoin(broadcast): same values, but the plan is a single
    * scan + project + TakeOrdered — no BroadcastExchange, no second scan
    * branch for the query row. */
  def cosineTopK(spark: SparkSession, sfDir: String, queryVecId: Long, k: Int): DataFrame = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qRow = emb.filter(col("vec_id") === queryVecId)
      .select(col("embedding")).limit(1).collect()
    if (qRow.isEmpty) // missing query vector: empty result, stable schema
      return emb.limit(0).select(col("vec_id"), col("label"), lit(0.0).as("cos"))
    val qB = spark.sparkContext.broadcast(qRow(0).getSeq[Float](0).toArray)
    val cosQ = udf { a: Seq[Float] =>
      val b = qB.value
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var d = 0
      while (d < a.length) {
        val x = a(d).toDouble; val y = b(d).toDouble
        dot += x * y; na += x * x; nb += y * y
        d += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    emb.filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), col("label"), round(cosQ(col("embedding")), 6).as("cos"))
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
      Hyperplanes.bucketUdf(cfg.sigBits, dim)(col("embedding")).as("bucket"))
    val x = bucketed.select(col("bucket"), col("vec_id").as("a"), col("embedding").as("ea"))
    val y = bucketed.select(col("bucket"), col("vec_id").as("b"), col("embedding").as("eb"))
    x.join(y, Seq("bucket")).filter(col("a") < col("b"))
      // compiled kernel replaces the interpreted HOF fold; identical FP
      // shape — dot / (sqrt(na)·sqrt(nb)) over dim-ascending double sums
      .withColumn("cos", cosineUdf(col("ea"), col("eb")))
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
        Hyperplanes.bucketUdf(cfg.sigBits, dim)(col("embedding")).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"), min("vec_id").as("min_vec"))
      .orderBy("bucket")
  }
}
