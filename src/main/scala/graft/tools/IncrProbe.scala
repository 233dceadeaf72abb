package graft.tools

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, SignatureStore}

/** Incremental-dedup cost probe: at an N-doc corpus with a B-doc fresh
  * batch, compare (a) the persisted-signature path (append batch + band
  * join vs store + verify), (b) minhashLshIncremental's full recompute,
  * and (c) full-corpus minhashLsh — the store's "per-batch cost scales
  * with the batch" claim as numbers. Args: [nCorpus] [nBatch]. */
object IncrProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val b = args.drop(1).headOption.map(_.toLong).getOrElse(10000L)
    val spark = graft.Sessions.local(32, "incr-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val vocab = SynthCorpus.heapsVocab(n)
    def gen(lo: Long, hi: Long) = SynthCorpus.docs(spark, lo, hi, vocab)

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[incrprobe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      a
    }

    val cut = n - b
    val dir = java.nio.file.Files.createTempDirectory("incrprobe-store").toString
    println(s"[incrprobe] corpus=$cut batch=$b")
    t("store_seed_corpus_append") {
      SignatureStore.append(spark, gen(0, cut), dir, 0L)
    }
    // the recurring per-batch cost a daily pipeline actually pays:
    t("store_batch_append") {
      SignatureStore.append(spark, gen(cut, n), dir, 1L)
    }
    val storePairs = t("store_batch_pairs") {
      SignatureStore.pairsTouchingFresh(spark, dir, cut, 0.95).count()
    }
    // the same answer recomputed from raw text, full-corpus signatures:
    val all = gen(0, n)
    val incrPairs = t("incremental_recompute") {
      Dedup.minhashLshIncremental(all, cut, 0.95).count()
    }
    // and the full-corpus dedup for scale reference:
    val fullPairs = t("full_minhash_lsh") {
      Dedup.minhashLsh(all, 0.95).count()
    }
    println(s"[incrprobe] pairs store=$storePairs incr=$incrPairs full=$fullPairs")
    assert(storePairs == incrPairs, "store path must equal recompute path")
    spark.stop()
  }
}
