package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data deduplication operators over the `documents` table.
  *
  * All variants are pure DataFrame pipelines (codegen'd built-ins, no Scala
  * UDFs in the hot path) whose semantics are reproducible in the DuckDB
  * oracle. At 100 TB the shapes hold: exact dedup is one hash-aggregate
  * shuffle on a 32-char key; minhash/LSH explodes each doc into F signature
  * rows (constant factor) and self-joins on the band key — the classic
  * band-bucket join whose skew is bounded because band signatures are
  * near-uniform; the pairwise verify only touches candidate pairs.
  */
object Dedup {

  /** Analyzer-equivalent token extraction as a Column (same regex + length
    * band as graft.analyze.TextAnalyzer — see AnalyzerSpec parity test). */
  def toks(c: Column): Column =
    filter(regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0)),
      t => length(t) >= 2 && length(t) <= 40)

  /** Exact dedup: md5 content hash; keeper = min doc_id per hash group. */
  def exact(documents: DataFrame): DataFrame = {
    val withHash = documents.select(col("doc_id"), md5(col("text")).as("h"))
    val keepers = withHash.groupBy("h")
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
    withHash.join(keepers, "h")
      .select(col("doc_id"), col("h"), (col("doc_id") === col("keeper")).as("is_keeper"),
        col("n_copies"))
      .orderBy("doc_id")
  }

  /** Exact token-set Jaccard near-dup pairs (the brute-force baseline the
    * LSH variants approximate): all pairs with J >= threshold.
    * Blocked self-join on distinct-token count would prune at scale; at gate
    * scale the straight self-join on crossJoin-with-filter is fine — the
    * LSH variant below is the 100 TB path.
    */
  def jaccardPairs(documents: DataFrame, threshold: Double): DataFrame = {
    val t = documents.select(col("doc_id"), array_sort(array_distinct(toks(col("text")))).as("ts"))
    val p = math.max(64, documents.sparkSession.sessionState.conf.numShufflePartitions)
    // explicit repartition: the nested-loop pair join parallelizes over LEFT
    // partitions — without this, a handful of input splits serialize the
    // O(n^2) compare (measured 216s -> ~30s at 5k docs)
    val a = t.repartition(p).select(col("doc_id").as("a"), col("ts").as("tsa"))
    val b = t.select(col("doc_id").as("b"), col("ts").as("tsb"))
    a.join(broadcast(b), col("a") < col("b"))
      .withColumn("inter", size(array_intersect(col("tsa"), col("tsb"))).cast("double"))
      .withColumn("uni", size(array_union(col("tsa"), col("tsb"))).cast("double"))
      .withColumn("j", col("inter") / col("uni"))
      .filter(col("j") >= threshold)
      .select(col("a"), col("b"), round(col("j"), 6).as("j"))
      .orderBy("a", "b")
  }

  val MinhashP = 2147483647L // 2^31 - 1
  val NumHashes = 16
  val BandRows = 4 // 4 bands x 4 rows

  /** 28-bit integer hash of a term via md5 prefix — chosen because the exact
    * same value is computable in DuckDB (CAST('0x'||substr(md5(t),1,7) AS
    * BIGINT)), keeping the oracle bit-identical. */
  def h32(c: Column): Column = conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  def hashA(j: Int): Long = (1664525L * (j + 1) + 1013904223L) % MinhashP
  def hashB(j: Int): Long = (22695477L * (j + 1) + 12345L) % MinhashP

  /** MinHash signatures over distinct tokens: doc_id, j, mh. */
  def minhash(documents: DataFrame): DataFrame = {
    val tok = documents
      .select(col("doc_id"), explode(array_distinct(toks(col("text")))).as("term"))
      .withColumn("h", h32(col("term")))
    val hashes = (0 until NumHashes).map { j =>
      min((col("h") * hashA(j) + hashB(j)) % MinhashP).as(s"mh$j")
    }
    tok.groupBy("doc_id").agg(hashes.head, hashes.tail: _*)
  }

  /** LSH candidate pairs: docs sharing at least one band signature, verified
    * with exact Jaccard, kept when J >= threshold. The scale path for
    * near-dup at 10^11 docs: band join instead of all-pairs. */
  def minhashLsh(documents: DataFrame, threshold: Double): DataFrame = {
    val mh = minhash(documents)
    val bands = (0 until NumHashes / BandRows).map { b =>
      val sig = concat_ws("-",
        (0 until BandRows).map(r => col(s"mh${b * BandRows + r}")): _*)
      mh.select(col("doc_id"), lit(b).as("band"), sig.as("sig"))
    }.reduce(_ unionAll _)
    val p = math.max(64, documents.sparkSession.sessionState.conf.numShufflePartitions)
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
      .repartition(p) // spread candidate pairs before the verify join
    val t = documents.select(col("doc_id"), array_sort(array_distinct(toks(col("text")))).as("ts"))
    cand
      .join(broadcast(t.select(col("doc_id").as("a"), col("ts").as("tsa"))), "a")
      .join(broadcast(t.select(col("doc_id").as("b"), col("ts").as("tsb"))), "b")
      .withColumn("j",
        size(array_intersect(col("tsa"), col("tsb"))).cast("double") /
        size(array_union(col("tsa"), col("tsb"))).cast("double"))
      .filter(col("j") >= threshold)
      .select(col("a"), col("b"), round(col("j"), 6).as("j"))
      .orderBy("a", "b")
  }

  /** 32-bit SimHash per doc: bit b set when the tf-weighted sum of term hash
    * bits is positive. */
  def simhash(documents: DataFrame): DataFrame = {
    val tf = documents
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .withColumn("h", h32(col("term")))
    tf.select(col("doc_id"), col("tf"), col("h"),
        explode(sequence(lit(0), lit(31))).as("b"))
      .withColumn("w", expr("CASE WHEN shiftright(h, b) & 1 = 1 THEN tf ELSE -tf END"))
      .groupBy("doc_id", "b").agg(sum("w").as("s"))
      .groupBy("doc_id")
      .agg(sum(expr("CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), b) ELSE CAST(0 AS BIGINT) END")).as("simhash"))
      .orderBy("doc_id")
  }
}
