package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Stage timing for ngramJaccardPairs (diagnostic). Args: [sfDir]. */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.local(32, "ngram-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ngramprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    // interpreted higher-order-function form vs the compiled UDF the
    // operator actually uses (both value-identical — OpsSpec parity test)
    val interpreted = docs.select(col("doc_id"),
      array_sort(array_distinct(transform(Dedup.shingles(Dedup.toks(col("text")), 3),
        s => xxhash64(s)))).as("ts"))
    val compiled = docs.select(col("doc_id"),
      Dedup.shingleHashes(3)(Dedup.toks(col("text"))).as("ts"))
    def groupsOf(s: org.apache.spark.sql.DataFrame) =
      s.filter(size(col("ts")) > 0).groupBy("ts")
        .agg(sort_array(collect_list(col("doc_id"))).as("members"))
    t("groups (interpreted HOF)")(groupsOf(interpreted).count())
    t("groups (compiled UDF)")(groupsOf(compiled).count())
    t("full ngramJaccardPairs")(Dedup.ngramJaccardPairs(docs, 3, 0.8).count())
    t("full jaccardPairs")(Dedup.jaccardPairs(docs, 0.95).count())
    spark.stop()
  }
}
