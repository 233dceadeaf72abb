package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic dataset sampling/splitting for training pipelines.
  *
  * Everything keys off the same md5-derived 28-bit hash the dedup family
  * uses (Dedup.h32) so the DuckDB oracle reproduces assignments
  * bit-identically, and assignments are a pure function of doc_id — stable
  * across runs, partitionings, and cluster sizes (the property that matters
  * at 100 TB: re-running a split tomorrow on re-partitioned data must not
  * move documents between train and test). A salt prefix decorrelates the
  * split hash from every other h32 use of doc_id. */
object Sampling {

  private def splitHash(salt: String) =
    Dedup.h32(concat(lit(salt + "-"), col("doc_id"))) % 100

  /** train/val/test assignment by hash percentile: [0, trainPct) → train,
    * [trainPct, trainPct+valPct) → val, rest → test. */
  def hashSplit(documents: DataFrame, trainPct: Int = 80, valPct: Int = 10,
                salt: String = "split"): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages: $trainPct/$valPct")
    documents.select(col("doc_id"), splitHash(salt).as("h"))
      .select(col("doc_id"),
        when(col("h") < trainPct, lit("train"))
          .when(col("h") < trainPct + valPct, lit("val"))
          .otherwise(lit("test")).as("split"))
      .orderBy("doc_id")
  }

  /** Deterministic ~1-in-n sample: keep doc_id iff hash(salt, doc_id) ≡ 0
    * (mod n) — the set-level analog of the reference blacklist's stateful
    * 1-in-N occurrence sampling (FilterFunction.java:11-31), but stateless
    * and reproducible under any partitioning. */
  def sampleOneInN(documents: DataFrame, n: Int, salt: String = "sample"): DataFrame = {
    require(n >= 1, s"sample modulus must be >= 1, got $n")
    documents
      .filter(Dedup.h32(concat(lit(salt + "-"), col("doc_id"))) % n === 0)
      .select(col("doc_id"))
      .orderBy("doc_id")
  }
}
