package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Scale probe for the sub-quadratic dedup members (diagnostic): synthesizes
  * N documents with a controlled near-dup structure (10% of docs are exact
  * pair-duplicates, so LSH/prefix candidate volume is ~N/20, not 0 and not
  * N²) and times exact / simhash / minhash-LSH / prefix-filter at 20-40x the
  * sf0.1 gate corpus. The quadratic members (jaccardPairs / ngram) are
  * intentionally absent — their cost is O(N²) by contract and their scale
  * path IS the LSH/prefix pair. Args: [nDocs]. */
object OpsScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = graft.Sessions.local(32, "ops-scale")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // deterministic text: ~40 words drawn from a mid-sized vocabulary by a
    // per-doc seed; docs where id % 20 < 2 share their text with their pair
    // partner (seed = id with the low bit cleared) -> ~n/20 duplicate pairs
    val docs = spark.range(0, n, 1, 64)
      .select(col("id").as("doc_id"),
        when(col("id") % 20 < 2, col("id").bitwiseAND(lit(-2L))).otherwise(col("id")).as("seed"))
      .select(col("doc_id"), concat_ws(" ",
        (0 until 40).map(i => concat(lit("w"),
          pmod(hash(col("seed") * 40 + i), lit(20000)))): _*).as("text"))

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val rows = f
      println(f"[opsscale] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$rows")
    }
    println(s"[opsscale] nDocs=$n derivedB=${Dedup.pairBlocksFor(n)}")
    t("dedup_exact")(Dedup.exact(docs).count())
    t("dedup_simhash")(Dedup.simhash(docs).count())
    t("dedup_minhash_lsh")(Dedup.minhashLsh(docs, 0.95).count())
    t("dedup_ngram_lsh")(Dedup.ngramMinhashLsh(docs, 3, 0.8).count())
    t("dedup_jaccard_prefix")(Dedup.jaccardPairsPrefix(docs, 0.95).count())
    spark.stop()
  }
}
