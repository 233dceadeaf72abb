package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted doc-level signature store — incremental dedup WITHOUT
  * re-tokenizing the corpus: each ingest batch appends its documents'
  * minhash signatures and sorted token sets once; thereafter a batch's
  * near-dup check is (fresh signatures) band-joined against the persisted
  * signature table plus a candidate-driven verify over the persisted token
  * sets. Per-batch cost scales with the batch and its candidates — the
  * corpus is touched only through columnar reads of two slim tables, never
  * through text analysis again. This closes `minhashLshIncremental`'s
  * documented caveat (it recomputes signatures corpus-wide per call).
  *
  * Layout under `dir`:
  *   signatures/batch_id=N/  (doc_id LONG, mhs ARRAY<LONG>)
  *   tokensets/batch_id=N/   (doc_id LONG, ts ARRAY<STRING>)
  * Appends are idempotent per batch (dynamic partition overwrite), matching
  * StreamDedup's replay contract.
  *
  * Semantics: doc-level LSH — identical to [[Dedup.minhashLsh]]'s output
  * restricted to pairs touching the fresh suffix (identical-set docs carry
  * identical signatures, so they always collide in band 0 and verify at
  * J = 1; SigStoreSpec asserts equality with minhashLshIncremental).
  * Token-less docs are outside the similarity domain, as everywhere.
  */
object SignatureStore {

  /** Append one batch's signatures + token sets (documents: doc_id, text). */
  def append(spark: SparkSession, batchDocs: DataFrame, dir: String,
             batchId: Long): Unit = {
    val sets = batchDocs.select(col("doc_id"),
        array_sort(array_distinct(Dedup.toks(col("text")))).as("ts"))
      .filter(size(col("ts")) > 0)
    val tok = sets.select(col("doc_id"), explode(col("ts")).as("term"))
      .withColumn("h", Dedup.h32(col("term")))
    val hashes = (0 until Dedup.NumHashes).map { j =>
      min((col("h") * Dedup.hashA(j) + Dedup.hashB(j)) % Dedup.MinhashP).as(s"mh$j")
    }
    val mh = tok.groupBy("doc_id").agg(hashes.head, hashes.tail: _*)
      .select(col("doc_id"),
        array((0 until Dedup.NumHashes).map(j => col(s"mh$j")): _*).as("mhs"))
    mh.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$dir/signatures")
    sets.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$dir/tokensets")
  }

  /** Near-dup pairs (a, b, j) with J >= threshold touching the fresh docId
    * suffix (b >= freshFrom), computed entirely from the store. */
  def pairsTouchingFresh(spark: SparkSession, dir: String, freshFrom: Long,
                         threshold: Double): DataFrame = {
    import spark.implicits._
    val sig = spark.read.parquet(s"$dir/signatures")
      .select(col("doc_id").as("sid"), col("mhs"),
        (col("doc_id") >= lit(freshFrom)).as("fresh"))
    // doc-level + epoch-ordered suffix: the output's larger side b is always
    // fresh, so the band join runs all×FRESH instead of all×all — the join
    // cost scales with the batch, not the corpus squared
    val cand = Dedup.bandCandidates(sig, withFresh = true, rightFreshOnly = true)
    // every doc is its own "group": members = [doc_id], sid = doc_id — the
    // shared verify cogroup then ships only candidate docs' token sets
    val groups = spark.read.parquet(s"$dir/tokensets")
      .select(col("ts"), array(col("doc_id")).as("members"), col("doc_id").as("sid"))
    Dedup.verifyCandidatePairsOf[Array[String]](groups, cand, threshold, Dedup.jaccardOf)
      .filter(col("b") >= lit(freshFrom))
      .select(col("a"), col("b"), round(col("j"), 6).as("j"))
      .orderBy("a", "b")
  }
}
