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

  /** Per-million keep threshold for a rate — computed ONCE driver-side so
    * the gate code and its oracle SQL interpolate the identical integer
    * (no cross-engine FP boundary risk). */
  def thresholdPerMillion(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    (rate * 1e6).toLong
  }

  /** Mixture control: per-stratum deterministic down-sampling — keep a doc
    * iff hash(salt, doc_id) mod 1e6 < threshold(stratum). Strata absent
    * from `rates` drop entirely (rate 0). Stateless hash-percentile keeps
    * the kept set stable under re-partitioning AND monotone in the rate
    * (raising a stratum's rate only ADDS documents — reproducible corpus
    * growth between pipeline versions). */
  def sampleByStratum(documents: DataFrame, stratumCol: String,
                      rates: Map[String, Double],
                      salt: String = "mix"): DataFrame = {
    val h = Dedup.h32(concat(lit(salt + "-"), col("doc_id"))) % 1000000
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(0L)) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(thresholdPerMillion(r))).otherwise(acc)
    }
    documents.filter(h < thr)
      .select(col("doc_id"), col(stratumCol).as("stratum"))
      .orderBy("doc_id")
  }

  /** Rates that rebalance observed stratum counts toward target
    * proportions: the largest corpus T satisfying kept_s = p_s·T ≤ c_s for
    * every targeted stratum is T = min_s(c_s/p_s); r_s = p_s·T/c_s. Driver
    * arithmetic over one groupBy-count collect (|strata| rows). */
  def rebalanceRates(documents: DataFrame, stratumCol: String,
                     targets: Map[String, Double]): Map[String, Double] = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      "targets must be positive weights")
    val wSum = targets.values.sum
    val p = targets.map { case (s, w) => s -> w / wSum }
    val counts = documents.groupBy(stratumCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    p.keys.foreach(s => require(counts.getOrElse(s, 0L) > 0L,
      s"targeted stratum '$s' has no documents"))
    val t = p.map { case (s, ps) => counts(s) / ps }.min
    p.map { case (s, ps) => s -> math.min(1.0, ps * t / counts(s)) }
  }
}
