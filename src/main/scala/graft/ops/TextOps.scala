package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over `documents`:
  * token counting, quality scoring, language-ID heuristic, fingerprinting.
  * All codegen'd built-ins; every formula is mirrored 1:1 in the DuckDB
  * oracle SQL (SparkEntry).
  */
object TextOps {

  /** Token counting: whitespace tokens vs analyzer (BPE-ish regex) tokens +
    * char len. */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("ws_tokens"),
        size(Dedup.toks(col("text"))).as("re_tokens"),
        length(col("text")).as("n_chars_computed"),
        col("n_chars"))
      .orderBy("doc_id")

  // the 10 heuristic stopwords used for quality + langid signals
  val StopwordsSql = "('the','a','of','to','and','in','is','it','on','for')"

  /** Quality score: length / stopword-ratio / distinct-ratio mix, rounded.
    * Deterministic heuristic (reference has no scoring; this is the
    * training-data-pipeline extension). */
  def qualityScore(documents: DataFrame): DataFrame =
    documents
      .withColumn("toks", Dedup.toks(col("text")))
      .withColumn("n", size(col("toks")).cast("double"))
      .withColumn("n_stop",
        size(filter(col("toks"), t => t.isin("the", "a", "of", "to", "and", "in", "is", "it", "on", "for"))).cast("double"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("double"))
      .select(
        col("doc_id"),
        col("n").cast("long").as("n_tokens"),
        round(col("n_stop") / col("n"), 6).as("stop_ratio"),
        round(col("n_distinct") / col("n"), 6).as("distinct_ratio"),
        round(
          least(col("n") / 64.0, lit(1.0)) * 0.4 +
          (lit(1.0) - col("n_stop") / col("n")) * 0.3 +
          (col("n_distinct") / col("n")) * 0.3, 6).as("quality"))
      .orderBy("doc_id")

  /** Language-ID heuristic: score = stopword hit-rate per language list;
    * predict argmax (ties -> lexicographic lang). The testdata's text is
    * synthetic same-vocab so this is a plumbing/determinism exercise, like a
    * real n-gram classifier would slot in. */
  val LangStops: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "en" -> Seq("the", "and", "is", "of", "to"),
    "es" -> Seq("el", "la", "que", "de", "es"),
    "fr" -> Seq("le", "la", "et", "est", "les"))

  def langId(documents: DataFrame): DataFrame = {
    val withToks = documents.withColumn("toks", Dedup.toks(col("text")))
    val scored = LangStops.foldLeft(withToks) { case (df, (lang, stops)) =>
      df.withColumn(s"s_$lang",
        size(filter(col("toks"), t => t.isin(stops: _*))).cast("double") /
          greatest(size(col("toks")).cast("double"), lit(1.0)))
    }
    // deterministic argmax: first lang (lexicographic) with s == max, max > 0
    val maxCol = LangStops.map(l => col(s"s_${l._1}")).reduce(greatest(_, _))
    val pred = LangStops.reverse.foldLeft(lit("und")) { case (acc, (lang, _)) =>
      when(col(s"s_$lang") === maxCol && maxCol > 0, lit(lang)).otherwise(acc)
    }
    scored.select(
        col("doc_id"), col("lang").as("lang_label"),
        pred.as("lang_pred"),
        round(maxCol, 6).as("lang_score"))
      .orderBy("doc_id")
  }

  /** Document fingerprint: winnowing-lite — min/max md5-derived hash over
    * 5-gram token shingles (rolling fingerprint of content, stable under
    * doc-id reshuffling).
    *
    * A doc's shingles all live in its own row, so min/max/count reduce IN
    * PLACE: one narrow mapPartitions, zero shuffle, zero explode (round 1
    * exploded ~50 shingle rows per doc through a hash-agg; at 100 TB that is
    * a full-corpus shuffle for a per-row reduction). Hash = first 7 hex
    * chars of md5(shingle) parsed base-16 — bit-identical to the oracle's
    * CAST('0x'||substr(md5(s),1,7) AS BIGINT) and to Dedup.h32. */
  def fingerprint(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val Shingle = 5
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def h32(s: String): Long = {
          md.reset()
          val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          // first 7 hex chars = 3.5 bytes, high nibble first
          var h = 0L
          var i = 0
          while (i < 7) {
            val b = d(i / 2) & 0xff
            h = h * 16 + (if (i % 2 == 0) b >> 4 else b & 0xf)
            i += 1
          }
          h
        }
        it.map { case (id, text) =>
          val toks = graft.analyze.TextAnalyzer.tokens(text)
          // same shingle set as sequence(0, greatest(n-5, 0)): short/empty
          // docs emit ONE (short) shingle, like the oracle's range form
          val nSh = math.max(toks.length - Shingle, 0) + 1
          var mn = Long.MaxValue; var mx = Long.MinValue
          val sb = new java.lang.StringBuilder(64)
          var i = 0
          while (i < nSh) {
            sb.setLength(0)
            var j = i
            val end = math.min(i + Shingle, toks.length)
            while (j < end) {
              if (j > i) sb.append(' ')
              sb.append(toks(j))
              j += 1
            }
            val h = h32(sb.toString)
            if (h < mn) mn = h
            if (h > mx) mx = h
            i += 1
          }
          (id, mn, mx, nSh.toLong)
        }
      }
      .toDF("doc_id", "fp_min", "fp_max", "n_shingles")
      .orderBy("doc_id")
  }
}
