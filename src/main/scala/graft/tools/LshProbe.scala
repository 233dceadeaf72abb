package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Diagnostic: stage-level timing of the token-minhash LSH pipeline over the
  * sf documents table — localizes where minhashLsh/keepers wall time goes.
  * Args: [sfDir]. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = graft.Sessions.local(32, "lsh-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[lshprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      a
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    t("warm-scan")(docs.count())

    val sets = docs.select(col("doc_id"), Dedup.tokenSetC(col("text")).as("ts"))
      .filter(size(col("ts")) > 0)
    val groups = sets.groupBy("ts")
      .agg(sort_array(collect_list(col("doc_id"))).as("members"))
      .withColumn("sid", element_at(col("members"), 1))
    val nGroups = t("groups_count")(groups.count())
    println(s"[lshprobe] groups=$nGroups")

    val full = t("minhashLsh_plan")(Dedup.minhashLsh(docs, 0.95))
    val n1 = t("minhashLsh_run1")(full.count())
    val n2 = t("minhashLsh_run2")(Dedup.minhashLsh(docs, 0.95).count())
    println(s"[lshprobe] pairs=$n1/$n2")

    val nk = t("keepers_run")(Dedup.keepers(docs, 0.95).count())
    println(s"[lshprobe] keepers=$nk iters=${Dedup.lastComponentsIters}")

    val ni = t("incr_run")(Dedup.minhashLshIncremental(docs, 400L, 0.95).count())
    println(s"[lshprobe] incr=$ni")
    spark.stop()
  }
}
