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

    // deterministic text: ~40 words drawn from a vocabulary that GROWS with
    // the corpus (V = n/10, Heaps-ish — real corpora add vocabulary as they
    // grow), so per-token df stays ~400 at every n: the regime the
    // sub-quadratic members are designed for. (A vocabulary FIXED while n
    // grows makes df ~ n and prefix-filter candidates ~ n² — the documented
    // degenerate case, measured separately by PrefixProbe.) At the
    // historical n=200k, V = 20k — identical corpus to the round-3 record.
    // Docs where id % 20 < 2 share their text with their pair partner
    // (seed = id with the low bit cleared) -> ~n/20 duplicate pairs.
    val vocab = math.max(20000L, n / 10)
    val docs = spark.range(0, n, 1, 64)
      .select(col("id").as("doc_id"),
        when(col("id") % 20 < 2, col("id").bitwiseAND(lit(-2L))).otherwise(col("id")).as("seed"))
      .select(col("doc_id"), concat_ws(" ",
        (0 until 40).map(i => concat(lit("w"),
          pmod(hash(col("seed") * 40 + i), lit(vocab)))): _*).as("text"))

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val rows = f
      println(f"[opsscale] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$rows")
    }
    println(s"[opsscale] nDocs=$n derivedB=${Dedup.pairBlocksFor(n)}")
    t("dedup_exact")(Dedup.exact(docs).count())
    t("dedup_simhash")(Dedup.simhash(docs).count())
    t("dedup_minhash_lsh")(Dedup.minhashLsh(docs, 0.95).count())
    t("dedup_ngram_lsh")(Dedup.ngramMinhashLsh(docs, 3, 0.8).count())
    t("dedup_ngram_lsh_fast")(Dedup.ngramMinhashLshFast(docs, 3, 0.8).count())
    t("dedup_jaccard_prefix")(Dedup.jaccardPairsPrefix(docs, 0.95).count())

    // ---- IVF at scale: n vectors, k = 512 (≈ sqrt-n sizing), Lloyd x2 ----
    // 16 planted gaussian-ish clusters + per-vector jitter; the broadcast
    // kernel assigns n x k x dim distances, refine() runs two deterministic
    // mean rounds, then 5 probes measure pruned-query latency + recall@10
    // against the brute-force exact top-10 of the same vectors
    val dim = 16
    val vecs = spark.range(0, n, 1, 64)
      .select(col("id").as("vec_id"), (col("id") % 16).as("cl"))
      .select(col("vec_id"), array((0 until dim).map { d =>
        ((pmod(hash(col("cl") * dim + d), lit(200)) - 100).cast("float") +
          (pmod(hash(col("vec_id") * dim + d), lit(100)).cast("float") / 100f)).cast("float")
      }: _*).as("embedding"), (col("vec_id") % 5).cast("int").as("label"))
    val ivfDir = java.nio.file.Files.createTempDirectory("opsscale-ivf").toString
    var cents: Array[(Int, Array[Float])] = null
    t("ivf_build_k512") {
      cents = graft.ops.IvfIndex.build(spark, vecs, ivfDir, 512, lloydIters = 2)
      spark.read.parquet(ivfDir).count()
    }
    val probeIds = Seq(1L, 7L, 23L, 101L, 999L)
    val probeVecs = vecs.filter(col("vec_id").isin(probeIds: _*))
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // timed section = the IVF probes ONLY; the brute-force reference ranking
    // for recall is computed outside the timer (it is the thing IVF avoids)
    val approxSets = scala.collection.mutable.Map[Long, Set[Long]]()
    t("ivf_query_x5") {
      probeIds.foreach { qid =>
        approxSets(qid) = graft.ops.IvfIndex
          .query(spark, ivfDir, cents, probeVecs(qid), 11, nprobe = 8)
          .collect().map(_.getLong(0)).filter(_ != qid).take(10).toSet
      }
      probeIds.size.toLong
    }
    val allVecs = vecs.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val recallSum = probeIds.map { qid =>
      val qv = probeVecs(qid)
      val exact = allVecs.iterator.filter(_._1 != qid)
        .map { case (id, v) =>
          var dot = 0.0; var na = 0.0; var nb = 0.0; var j = 0
          while (j < v.length) {
            dot += v(j).toDouble * qv(j).toDouble
            na += v(j).toDouble * v(j); nb += qv(j).toDouble * qv(j); j += 1
          }
          (id, dot / (math.sqrt(na) * math.sqrt(nb)))
        }
        .toArray.sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
      (approxSets(qid) intersect exact).size / 10.0
    }.sum
    println(f"[opsscale] ivf_recall@10        mean=${recallSum / probeIds.size}%.2f (nprobe=8/512)")
    spark.stop()
  }
}
