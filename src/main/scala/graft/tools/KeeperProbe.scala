package graft.tools

import graft.ops.{Dedup, KeeperStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** KeeperStore per-batch cost probe: a FIXED-size fresh batch of pairs
  * maintained against keeper stores seeded at three sizes (n/5, 3n/5, n),
  * compacted before the measured batch — the recurring cost a daily
  * pipeline pays for continuous keeper assignment, as numbers.
  *
  * Two fresh-pair shapes bound the bucket-pruning behaviour of the stale
  * label lookup (KeeperStore.update): `scattered` stale endpoints touch all
  * [[KeeperStore.LabelBuckets]] buckets (worst case — the pruned scan is
  * the whole slim labels table, broadcast-joined, no shuffle), `clustered`
  * endpoints land in ONE bucket (best case — 1/64th of the table read).
  * `assignments` is timed after the batch: post-compaction it is one labels
  * scan + components over the merges appended SINCE compaction only.
  * At the smallest size the store assignment is equality-asserted against
  * [[Dedup.keepersFromPairs]] over the cumulative pair set.
  * Args: [nCorpus] [nBatch]. */
object KeeperProbe {

  /** Chain pairs (i-1, i) for i % 100 in {1, 2} — ~2% of docs in
    * components of size 3, the rest singletons. */
  private def chainPairs(spark: SparkSession, lo: Long, hi: Long): DataFrame =
    spark.range(lo + 1, hi).toDF("b")
      .filter(pmod(col("b"), lit(100L)).isin(1L, 2L))
      .select((col("b") - 1).as("a"), col("b"))

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val b = args.drop(1).headOption.map(_.toLong).getOrElse(10000L)
    val spark = graft.Sessions.local(32, "keeper-probe")
    spark.sparkContext.setLogLevel("ERROR")

    def docs(lo: Long, hi: Long) = spark.range(lo, hi).toDF("doc_id")
    def secs[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def best[A](label: String, reps: Int)(f: => A): Double = {
      val rs = (1 to reps).map(_ => secs(f))
      val m = rs.map(_._2).min
      println(f"[keeperprobe] $label%-40s $m%7.2fs  " +
        s"(reps=${rs.map(r => f"${r._2}%.2f").mkString("/")})")
      m
    }

    // fresh batch [n, n+b): internal chains + stale-touching bridges
    def freshPairs(s: Long, clustered: Boolean): DataFrame = {
      val internal = chainPairs(spark, s, s + b)
      // stale endpoints: every 50th fresh doc bridges to doc j-s (scattered
      // across all doc_id % 64 buckets); clustered uses every (50*64)th so
      // every stale endpoint falls in bucket 0
      val step = if (clustered) 50L * KeeperStore.LabelBuckets else 50L
      val bridges = spark.range(s, s + b).toDF("b")
        .filter(pmod(col("b"), lit(step)) === 0L)
        .select((col("b") - s).as("a"), col("b"))
      internal.union(bridges)
    }

    val sizes = Seq(n / 5, 3 * n / 5, n)
    println(s"[keeperprobe] batch=$b store sizes=${sizes.mkString(",")}")
    val perSize = sizes.map { s =>
      val dir = java.nio.file.Files.createTempDirectory(s"keeperprobe-$s").toString
      val (_, seedT) = secs {
        KeeperStore.update(spark, dir, docs(0, s), chainPairs(spark, 0, s), 0L, 0L)
        KeeperStore.compact(spark, dir, 0L)
      }
      println(f"[keeperprobe] ${s"seed+compact[store=$s]"}%-40s $seedT%7.2fs")
      val up = best(s"batch_update[store=$s] scattered", 2) {
        KeeperStore.update(spark, dir, docs(s, s + b), freshPairs(s, false), 1L, s)
      }
      val upC = best(s"batch_update[store=$s] clustered", 2) {
        KeeperStore.update(spark, dir, docs(s, s + b), freshPairs(s, true), 1L, s)
      }
      val asg = best(s"assignments[store=$s]", 2) {
        KeeperStore.assignments(spark, dir).count()
      }
      (s, up, upC, asg)
    }
    def growth(f: ((Long, Double, Double, Double)) => Double): String =
      f"${f(perSize.head)}%.2fs -> ${f(perSize.last)}%.2fs " +
        f"(${f(perSize.last) / f(perSize.head)}%.2fx)"
    val span = sizes.last / sizes.head
    println(s"[keeperprobe] update(scattered) growth over ${span}x store: ${growth(_._2)}")
    println(s"[keeperprobe] update(clustered) growth over ${span}x store: ${growth(_._3)}")
    println(s"[keeperprobe] assignments growth over ${span}x store: ${growth(_._4)}")

    // correctness at the smallest size: store assignment == batch operator
    // over the cumulative pair set (the last update rep above was the
    // clustered shape, so compare against chains + clustered bridges)
    val s0 = sizes.head
    val dir0 = java.nio.file.Files.createTempDirectory("keeperprobe-eq").toString
    KeeperStore.update(spark, dir0, docs(0, s0), chainPairs(spark, 0, s0), 0L, 0L)
    KeeperStore.compact(spark, dir0, 0L)
    KeeperStore.update(spark, dir0, docs(s0, s0 + b), freshPairs(s0, true), 1L, s0)
    val store = KeeperStore.assignments(spark, dir0)
    val oracle = Dedup.keepersFromPairs(docs(0, s0 + b),
      chainPairs(spark, 0, s0).union(freshPairs(s0, true)))
    val diff = store.except(oracle).count() + oracle.except(store).count()
    println(s"[keeperprobe] store-vs-operator diff rows: $diff")
    assert(diff == 0, "store assignment must equal keepersFromPairs")
    spark.stop()
  }
}
