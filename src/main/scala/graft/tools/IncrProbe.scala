package graft.tools

import graft.ops.{Dedup, SignatureStore}

/** Incremental-dedup cost probe: a FIXED-size fresh batch checked against
  * persisted signature stores of three sizes (n/5, 3n/5, n) — the store's
  * "per-batch cost scales with the batch, not the store" claim as numbers
  * (round-4's store scanned+shuffled the whole signature table per batch
  * and grew 5.5 s → 14.7 s over a 5× store; the round-5 band-row layout
  * reads slim precomputed band rows and never shuffles the store side).
  * At the smallest size the store path is equality-asserted against
  * minhashLshIncremental's full recompute, and full-corpus minhashLsh is
  * timed for scale reference. Args: [nCorpus] [nBatch]. */
object IncrProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val b = args.drop(1).headOption.map(_.toLong).getOrElse(10000L)
    val spark = graft.Sessions.local(32, "incr-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val vocab = SynthCorpus.heapsVocab(n + b)
    def gen(lo: Long, hi: Long) = SynthCorpus.docs(spark, lo, hi, vocab)

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[incrprobe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      a
    }
    def secs[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val sizes = Seq(n / 5, 3 * n / 5, n)
    println(s"[incrprobe] batch=$b store sizes=${sizes.mkString(",")}")
    val perSize = sizes.map { s =>
      val dir = java.nio.file.Files.createTempDirectory(s"incrprobe-$s").toString
      t(f"seed_append[store=$s]") { SignatureStore.append(spark, gen(0, s), dir, 0L) }
      // the recurring per-batch cost a daily pipeline actually pays:
      t(f"batch_append[store=$s]") { SignatureStore.append(spark, gen(s, s + b), dir, 1L) }
      val reps = (1 to 2).map { _ =>
        secs(SignatureStore.pairsTouchingFresh(spark, dir, s, 0.95,
          batchId = Some(1L)).count())
      }
      val best = reps.map(_._2).min
      val label = s"batch_pairs[store=$s]"
      println(f"[incrprobe] $label%-34s $best%7.2fs  " +
        s"(reps=${reps.map(r => f"${r._2}%.2f").mkString("/")}) pairs=${reps.head._1}")
      (s, best, reps.head._1)
    }
    val growth = perSize.last._2 / perSize.head._2
    println(f"[incrprobe] pairs-cost growth over ${sizes.last / sizes.head}x store: " +
      f"${perSize.head._2}%.2fs -> ${perSize.last._2}%.2fs (${growth}%.2fx)")

    // correctness + scale reference at the smallest size
    val s0 = sizes.head
    val dir0 = java.nio.file.Files.createTempDirectory("incrprobe-eq").toString
    SignatureStore.append(spark, gen(0, s0), dir0, 0L)
    SignatureStore.append(spark, gen(s0, s0 + b), dir0, 1L)
    val storePairs = SignatureStore.pairsTouchingFresh(spark, dir0, s0, 0.95).count()
    val all = gen(0, s0 + b)
    val incrPairs = t("incremental_recompute") {
      Dedup.minhashLshIncremental(all, s0, 0.95).count()
    }
    val fullPairs = t("full_minhash_lsh") {
      Dedup.minhashLsh(all, 0.95).count()
    }
    println(s"[incrprobe] pairs store=$storePairs incr=$incrPairs full=$fullPairs")
    assert(storePairs == incrPairs, "store path must equal recompute path")
    spark.stop()
  }
}
