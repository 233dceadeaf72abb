package graft.tools

import graft.ops.{Dedup, KeeperStore, SignatureStore}
import org.apache.spark.sql.functions._

/** End-to-end production-loop probe for the streaming-dedup layer: drives
  * [[graft.streaming.StreamDedup.processBatch]] (sign + store append +
  * band-pruned pair check + keeper maintenance + periodic compaction of
  * BOTH stores) over a seed batch and K equal fresh batches, timing each
  * full batch — the number a daily/hourly ingest pipeline actually pays.
  * Flat late-vs-early per-batch wall time is the claim behind "the store
  * side never shuffles and compaction keeps the live merge graph small";
  * IncrProbe and KeeperProbe evidence the pieces in isolation, this probe
  * evidences their composition.
  *
  * After the drive, the cumulative pair table is equality-asserted against
  * a one-call [[Dedup.minhashLsh]] over everything ingested, and the store
  * keeper assignment against [[Dedup.keepersFromPairs]] over those pairs.
  * Args: [seed] [batch] [nBatches] [compactEvery] (defaults 200000 20000
  * 8 3). */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val seed = args.headOption.map(_.toLong).getOrElse(200000L)
    val b = args.drop(1).headOption.map(_.toLong).getOrElse(20000L)
    val k = args.drop(2).headOption.map(_.toInt).getOrElse(8)
    val every = args.drop(3).headOption.map(_.toInt).getOrElse(3)
    val spark = graft.Sessions.local(32, "stream-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val vocab = SynthCorpus.heapsVocab(seed + k * b)
    def gen(lo: Long, hi: Long) = SynthCorpus.docs(spark, lo, hi, vocab)

    val base = java.nio.file.Files.createTempDirectory("streamprobe").toString
    val corpus = s"$base/corpus"
    val pairsDir = s"$base/pairs"
    val keepers = Some(s"$base/keepers")
    println(s"[streamprobe] seed=$seed batch=$b nBatches=$k compactEvery=$every")

    val times = (0 to k).map { i =>
      val (lo, hi) = if (i == 0) (0L, seed) else
        (seed + (i - 1) * b, seed + i * b)
      val t0 = System.nanoTime()
      graft.streaming.StreamDedup.processBatch(
        spark, gen(lo, hi), i.toLong, corpus, pairsDir, 0.95,
        compactEvery = every, keepersDir = keepers)
      val t = (System.nanoTime() - t0) / 1e9
      val label = if (i == 0) f"seed_batch[$lo%d,$hi%d)" else f"batch_$i[$lo%d,$hi%d)"
      println(f"[streamprobe] $label%-32s $t%7.2fs")
      t
    }
    val fresh = times.drop(1)
    println(f"[streamprobe] per-batch first=${fresh.head}%.2fs last=${fresh.last}%.2fs " +
      f"min=${fresh.min}%.2fs max=${fresh.max}%.2fs " +
      f"last/first=${fresh.last / fresh.head}%.2fx over ${k}%d batches " +
      f"(store grew ${seed}%d -> ${seed + k * b}%d docs)")

    // equality: cumulative store pairs == one-call operator; store keepers
    // == operator keepers over those pairs
    val all = gen(0, seed + k * b)
    val storePairs = spark.read.parquet(pairsDir).select("a", "b", "j")
    val opPairs = Dedup.minhashLsh(all, 0.95)
    val pd = storePairs.except(opPairs).count() + opPairs.except(storePairs).count()
    println(s"[streamprobe] pairs store-vs-operator diff rows: $pd")
    assert(pd == 0, "cumulative store pairs must equal one-call minhashLsh")
    val storeKeep = KeeperStore.assignments(spark, keepers.get)
    val opKeep = Dedup.keepersFromPairs(all.select("doc_id"), opPairs)
    val kd = storeKeep.except(opKeep).count() + opKeep.except(storeKeep).count()
    println(s"[streamprobe] keepers store-vs-operator diff rows: $kd")
    assert(kd == 0, "store keepers must equal keepersFromPairs")

    // store hygiene after the drive: compaction kept partition counts flat
    def parts(p: String): Int =
      Option(new java.io.File(p).listFiles()).map(_.count(_.getName.startsWith("batch_id="))).getOrElse(0)
    println(s"[streamprobe] partitions: signatures=${parts(s"$corpus-sigstore/signatures")} " +
      s"tokensets=${parts(s"$corpus-sigstore/tokensets")} " +
      s"labels=${parts(s"${keepers.get}/labels")} merges=${parts(s"${keepers.get}/merges")}")
    spark.stop()
  }
}
