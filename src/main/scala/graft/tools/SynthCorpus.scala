package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The one synthetic probe corpus shared by OpsScale / IncrProbe /
  * PrefixProbe (a drifted copy per tool silently changes one probe's regime
  * and invalidates cross-tool comparisons — found in round-4 review).
  *
  * Deterministic text: 40 words drawn from `vocab` by a per-doc seed; docs
  * where id % 20 < 2 share their text with their pair partner (seed = id
  * with the low bit cleared) → ~(hi-lo)/20 planted duplicate pairs.
  * `heapsVocab(n)` = max(20k, n/10) keeps per-token df ~400 at every n
  * (Heaps-ish — the regime the sub-quadratic members target); passing a
  * FIXED vocab while n grows makes df ∝ n — the documented degenerate
  * regime PrefixProbe measures on purpose. */
object SynthCorpus {

  def heapsVocab(n: Long): Long = math.max(20000L, n / 10)

  def docs(spark: SparkSession, lo: Long, hi: Long, vocab: Long): DataFrame =
    spark.range(lo, hi, 1, 64)
      .select(col("id").as("doc_id"),
        when(col("id") % 20 < 2, col("id").bitwiseAND(lit(-2L))).otherwise(col("id")).as("seed"))
      .select(col("doc_id"), concat_ws(" ",
        (0 until 40).map(i => concat(lit("w"),
          pmod(hash(col("seed") * 40 + i), lit(vocab)))): _*).as("text"))
}
