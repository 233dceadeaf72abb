package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ops.{Dedup, GateIndex, Multimodal, Similarity, TextOps, Transcripts}
import graft.query.SearchQuery
import graft.streaming.{EventStream, SizedFlush}

/** Driver contract — one `queries` entry per implemented operator (SURVEY.md
  * §2 inventory + the training-data-pipeline extensions), each with an
  * equivalent DuckDB oracle in `oracleSql`.
  *
  * Parity rules used throughout (so value-hash compare is stable):
  *  - every output column lowercase + explicitly aliased on both sides;
  *  - counts cast to BIGINT, sizes to INT on both sides;
  *  - FP outputs rounded (6dp after single/ordered float ops, 4dp for big
  *    unordered double sums, 0dp for monetary sums) — cross-system FP noise
  *    is ~1e-12 relative, far inside the rounding;
  *  - every query deterministically ORDERed;
  *  - top-k cuts only where ties cannot straddle the boundary (rare terms or
  *    raw stored values), never on freshly-summed doubles.
  */
object SparkEntry {

  /** Flagship: BM25 top-k over the AND of two terms on the rare 'dup' term —
    * exercises the full index build + WAND query path. */
  def entry(spark: SparkSession): DataFrame =
    queries("ft_bm25_topk")(spark, "/root/testdata/sf0.001")

  private def eng(s: SparkSession, dir: String) = GateIndex.engine(s, dir)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- fulltext engine (documents -> transcripts -> index -> query) ----
    "ft_docids" -> ((s, dir) => {
      eng(s, dir).docstore
        .select(col("docId").as("docid"), col("conv_id"), col("turn_idx"),
          col("role"), col("tool"))
        .orderBy("docid")
    }),
    "ft_tokenize" -> ((s, dir) => {
      graft.build.IndexBuilder.termOccs(eng(s, dir).docstore)
        .filter(col("field") === "text")
        .select(col("docId").as("docid"), col("term"), col("tf").cast("int").as("tf"),
          col("dl").cast("int").as("dl"))
        .orderBy("docid", "term")
    }),
    "ft_term_stats" -> ((s, dir) => {
      s.read.parquet(s"${eng(s, dir).dir}/termstats")
        .filter(col("field") === "text")
        .select(col("term"), col("df").cast("long").as("df"), col("pv").cast("long").as("pv"))
        .orderBy("term")
    }),
    "ft_search_and" -> ((s, dir) =>
      eng(s, dir).matchingDocIds(SearchQuery.of(Seq("text" -> Seq("spark", "merge")), 0))),
    "ft_bm25_single" -> ((s, dir) => {
      val e = eng(s, dir)
      e.scoreAll(SearchQuery.of(Seq("text" -> Seq("spark")), 0))
        .select(col("docId").as("docid"), round(col("score"), 6).as("score_r"))
        .orderBy("docid")
    }),
    "ft_bm25_and2" -> ((s, dir) => {
      val e = eng(s, dir)
      e.scoreAll(SearchQuery.of(Seq("text" -> Seq("spark", "merge")), 0))
        .select(col("docId").as("docid"), round(col("score"), 6).as("score_r"))
        .orderBy("docid")
    }),
    "ft_bm25_topk" -> ((s, dir) => {
      // 'dup' is rare (df << k) so the cut never lands on a score tie
      val e = eng(s, dir)
      e.topK(SearchQuery.of(Seq("text" -> Seq("dup")), 30))
        .select(col("docId").as("docid"), round(col("score"), 6).as("score_r"))
        .orderBy(desc("score_r"), asc("docid"))
    }),
    "ft_fetch_text" -> ((s, dir) => {
      val e = eng(s, dir)
      e.fetch(SearchQuery.of(Seq("text" -> Seq("dup")), 30))
        .select(col("docId").as("docid"), col("conv_id"), col("turn_idx"),
          col("role"), col("text"), round(col("score"), 6).as("score_r"))
        .orderBy(desc("score_r"), asc("docid"))
    }),
    "ft_filter_fetch" -> ((s, dir) => {
      // result post-filter (reference req.filter): predicate on stored fields
      // applied below the top-k cut; 'dup' is rare so the cut never lands on
      // a tie (same guarantee as ft_bm25_topk)
      val e = eng(s, dir)
      e.fetchFiltered(SearchQuery.of(Seq("text" -> Seq("dup")), 30), col("role") === "user")
        .select(col("docId").as("docid"), col("role"), round(col("score"), 6).as("score_r"))
        .orderBy(desc("score_r"), asc("docid"))
    }),
    "ft_pvuv" -> ((s, dir) => {
      import s.implicits._
      val st = eng(s, dir).searchStats(SearchQuery.of(Seq("text" -> Seq("spark")), 1))
      Seq((st.total, st.pv, st.uv)).toDF("total", "pv", "uv")
    }),

    // ---- relational coverage (scan/filter/agg/join/window/sort/limit) ----
    "rel_q1_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .filter(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"), // integer-valued doubles: exact
          round(sum("l_extendedprice"), 0).as("sum_base_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "rel_join_agg" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
      val n = s.read.parquet(s"$dir/nation.parquet")
      val o = s.read.parquet(s"$dir/orders.parquet")
      val l = s.read.parquet(s"$dir/lineitem.parquet")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name", "o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 0).as("revenue"))
        .orderBy("n_name", "o_orderpriority")
    }),
    "rel_window_running" -> ((s, dir) => {
      // ordering includes l_quantity so tied rows are value-identical, and
      // the frame is explicitly ROWS (Spark's default with orderBy is RANGE,
      // which sums ALL peers of a tie — diverges from the SQL ROWS frame)
      val w = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
      val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate"), col("l_quantity"))
        .withColumn("rn", row_number().over(w))
        .withColumn("run_qty", sum("l_quantity").over(wRows)) // ordered sum: exact parity
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("rn"), col("run_qty"))
        .orderBy("l_suppkey", "rn")
    }),
    "rel_topk_orders" -> ((s, dir) => {
      // ranks on raw stored doubles (no fresh arithmetic): exact both sides
      s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(10)
    }),
    "rel_events_daily" -> ((s, dir) => {
      s.read.parquet(s"$dir/events.parquet")
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd HH:mm:ss").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
        .orderBy("day", "event_type")
    }),
    "stream_hourly" -> ((s, dir) => EventStream.hourlyByType(s, dir)),
    "stream_hourly_append" -> ((s, dir) => EventStream.hourlyAppendGate(s, dir)),
    // size-triggered early flush (T3, logto_hdfs_collector.go:215-242):
    // flatMapGroupsWithState segment manifests — "size" flushes whenever a
    // bucket's accumulated bytes reach the threshold, "timeout" remainders
    // when the watermark closes the bucket
    "stream_sized_flush" -> ((s, dir) => SizedFlush.sizedFlushGate(s, dir)),

    // ---- field extraction: reference line formats JSON/TAB/KV (P1-P3,
    // CommonLogParser.java:49-61; dotted-path JSON TokenParser.java:87-121) ----
    "px_json" -> ((s, dir) => {
      s.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id")
    }),
    "px_tab_kv" -> ((s, dir) => {
      // synthesize TAB and KV lines, then extract positionally / by regex
      s.read.parquet(s"$dir/documents.parquet")
        .withColumn("tabline", concat_ws("\t", col("lang"), col("source"), col("n_chars")))
        .withColumn("kvline", concat(lit("<lang="), col("lang"), lit("><source="), col("source"), lit(">")))
        .select(col("doc_id"),
          split(col("tabline"), "\t").getItem(1).as("tab_source"),
          regexp_extract(col("kvline"), "<source=([^>]*)>", 1).as("kv_source"),
          regexp_extract(col("kvline"), "<lang=([^>]*)>", 1).as("kv_lang"))
        .orderBy("doc_id")
    }),

    "px_chain_url" -> ((s, dir) => {
      // config-driven tokenizer chain (the reference's tokenizer:{field:[...]}
      // model) driven end-to-end: the 'url' chain over a synthesized URL whose
      // STRUCTURE is fixed, so the oracle enumerates the expected variant set
      // literally — port riding on combos + the public-suffix skip included
      val chain = graft.analyze.AnalyzerChains.parse("url")
      val f = udf((u: String) => chain.tokens(u))
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          concat(lit("https://files.data.example.com.cn:9000/pub/"), col("source"), lit("/item")).as("u"))
        .select(col("doc_id"), posexplode(f(col("u"))))
        .select(col("doc_id"), col("pos").cast("int").as("pos"), col("col").as("token"))
        .orderBy("doc_id", "pos")
    }),

    "px_chain_blacklist" -> ((s, dir) => {
      // the reference's canonical [text, tokenfilter] field chain
      // (TokenParser.java:50-51) with drop-only blacklist semantics: token
      // positions shift left past dropped tokens, which the positional
      // oracle reproduces
      val chain = graft.analyze.AnalyzerChains.parse("text|blacklist:join,hash,the")
      val f = udf((t: String) => chain.tokens(t))
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), posexplode(f(col("text"))))
        .select(col("doc_id"), col("pos").cast("int").as("pos"), col("col").as("token"))
        .orderBy("doc_id", "pos")
    }),

    "px_chain_cjk" -> ((s, dir) => {
      // dictionary FMM segmenter (the IK slot) on the gate: a deterministic
      // CJK suffix (by doc_id % 3, three fixed phrases) rides each doc's
      // text through the cjkdict chain; the oracle reproduces latin tokens
      // by regex and the three phrases' known FMM segmentations literally
      val chain = graft.analyze.AnalyzerChains.parse("cjkdict:中文,分词,搜索,引擎,数据,处理")
      val f = udf((t: String) => chain.tokens(t))
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), concat(col("text"), lit(" "),
          element_at(array(lit("中文分词"), lit("搜索引擎"), lit("数据处理")),
            (col("doc_id") % 3).cast("int") + 1)).as("ctext"))
        .select(col("doc_id"), posexplode(f(col("ctext"))))
        .select(col("doc_id"), col("pos").cast("int").as("pos"), col("col").as("token"))
        .orderBy("doc_id", "pos")
    }),

    "px_chain_quality" -> ((s, dir) => {
      // the reference's FULL P6 predicate (segmentNeedOutput) as a chain
      // stage behind the dictionary segmenter: a deterministic CJK suffix
      // adds two dictionary words plus one lone ideograph per doc; quality
      // drops the lone char (Chinese len<2), short latin (len<4), short
      // digit runs (len<5) — the oracle reproduces the surviving positions
      val chain = graft.analyze.AnalyzerChains.parse(
        "cjkdict:中文,分词,搜索,引擎,数据,处理|quality")
      val f = udf((t: String) => chain.tokens(t))
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), concat(col("text"), lit(" "),
          element_at(array(lit("中文分词 了"), lit("搜索引擎 和"), lit("数据处理 吗")),
            (col("doc_id") % 3).cast("int") + 1)).as("qtext"))
        .select(col("doc_id"), posexplode(f(col("qtext"))))
        .select(col("doc_id"), col("pos").cast("int").as("pos"), col("col").as("token"))
        .orderBy("doc_id", "pos")
    }),

    // ---- training-data pipeline: dedup family ----
    "dedup_exact" -> ((s, dir) => Dedup.exact(s.read.parquet(s"$dir/documents.parquet"))),
    "dedup_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(s.read.parquet(s"$dir/documents.parquet"), 0.95)),
    "dedup_jaccard_prefix" -> ((s, dir) =>
      Dedup.jaccardPairsPrefix(s.read.parquet(s"$dir/documents.parquet"), 0.95)),
    "dedup_ngram" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(s.read.parquet(s"$dir/documents.parquet"), 3, 0.8)),
    "dedup_ngram_lsh" -> ((s, dir) =>
      Dedup.ngramMinhashLsh(s.read.parquet(s"$dir/documents.parquet"), 3, 0.8)),
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLsh(s.read.parquet(s"$dir/documents.parquet"), 0.95)),
    // daily-ingest incremental dedup: only pairs touching the fresh docId
    // suffix (>= 400) are candidate-joined and verified
    "dedup_lsh_incr" -> ((s, dir) =>
      Dedup.minhashLshIncremental(s.read.parquet(s"$dir/documents.parquet"), 400L, 0.95)),
    // keeper assignment: connected components over the LSH pair graph;
    // every doc gets its component's min doc_id as keeper
    "dedup_keepers" -> ((s, dir) =>
      Dedup.keepers(s.read.parquet(s"$dir/documents.parquet"), 0.95)),
    // the PRODUCTION streaming-dedup batch path (signature store + band
    // rows + compaction) driven end-to-end over two epoch-ordered batches
    "dedup_store_incr" -> ((s, dir) => graft.ops.GateStoreIncr.pairs(s, dir)),
    // keeper assignment maintained CONTINUOUSLY by that same drive
    // (KeeperStore updated per batch, both stores compacted mid-drive) —
    // must equal the one-call batch operator over the full corpus
    "dedup_keepers_store" -> ((s, dir) => graft.ops.GateStoreIncr.keepers(s, dir)),
    "dedup_simhash" -> ((s, dir) => Dedup.simhash(s.read.parquet(s"$dir/documents.parquet"))),
    "dedup_simhash_near" -> ((s, dir) => Dedup.simhashPairs(s.read.parquet(s"$dir/documents.parquet"), 3)),
    "dedup_simhash_near_wide" -> ((s, dir) => Dedup.simhashPairsWide(s.read.parquet(s"$dir/documents.parquet"), 3)),

    // ---- similarity search ----
    "ann_cosine_top10" -> ((s, dir) => Similarity.cosineTopK(s, dir, 0, 10)),
    "dedup_embed" -> ((s, dir) => Similarity.embedDupPairs(s, dir, 0.4)),
    "dedup_embed_ann" -> ((s, dir) => Similarity.embedDupPairsAnn(s, dir, 0.4)),
    "ann_lsh_buckets" -> ((s, dir) => Similarity.lshBuckets(s, dir)),
    // both ann_ivf_* gates probe ONE persisted index + its persisted
    // quantizer (GateIvf — the GateIndex pattern: queries are queries, the
    // build is the build, benchmarked separately); iters = 0 so the oracle
    // reproduces the unrefined lowest-vec_id centroids
    "ann_ivf_buckets" -> ((s, dir) => {
      val (idx, cents) = graft.ops.GateIvf.index(s, dir, 16)
      if (cents.isEmpty) // empty embeddings table: schema-stable empty frame
        s.read.parquet(s"$dir/embeddings.parquet").limit(0)
          .select(lit(0).as("centroid"), lit(0L).as("n"), col("vec_id").as("min_vec"))
      else s.read.parquet(idx)
        .groupBy("centroid").agg(count(lit(1)).as("n"), min("vec_id").as("min_vec"))
        .select(col("centroid").cast("int").as("centroid"), col("n"), col("min_vec"))
        .orderBy("centroid")
    }),
    "ann_ivf_top10" -> ((s, dir) => {
      val (idx, cents) = graft.ops.GateIvf.index(s, dir, 16)
      if (cents.isEmpty) // empty embeddings table: schema-stable empty frame
        s.read.parquet(s"$dir/embeddings.parquet").limit(0)
          .select(col("vec_id"), col("label"), lit(0).as("centroid"), lit(0.0).as("cos"))
      else {
        val qv = s.read.parquet(s"$dir/embeddings.parquet")
          .filter(col("vec_id") === 0L)
          .select("embedding").collect()(0).getSeq[Float](0).toArray
        // round BEFORE the top-k cut (like ann_cosine_top10): the oracle's
        // ORDER BY binds to the rounded alias, so cutting on raw cos would
        // pick different rows on a rank-10/11 tie that rounding collapses
        graft.ops.IvfIndex.queryCandidates(s, idx, cents, qv, nprobe = 4)
          .select(col("vec_id"), col("label"), col("centroid").cast("int").as("centroid"),
            round(col("cos"), 6).as("cos"))
          .orderBy(desc("cos"), asc("vec_id"))
          .limit(10)
      }
    }),

    // ---- dataset assembly: deterministic split / sample / sequence packing ----
    "ds_split" -> ((s, dir) => graft.ops.Sampling.hashSplit(s.read.parquet(s"$dir/documents.parquet"))),
    "ds_sample" -> ((s, dir) => graft.ops.Sampling.sampleOneInN(s.read.parquet(s"$dir/documents.parquet"), 20)),
    "ds_mix" -> ((s, dir) =>
      graft.ops.Sampling.sampleByStratum(s.read.parquet(s"$dir/documents.parquet"), "lang", MixRates)),
    "text_pack" -> ((s, dir) => TextOps.packSequences(s.read.parquet(s"$dir/documents.parquet"), 256)),

    // ---- curation hygiene: benchmark decontamination + attrition funnel ----
    "decontam" -> ((s, dir) => {
      // pretend eval set = every 50th doc; flag training docs sharing any
      // word 5-gram with it
      val docs = s.read.parquet(s"$dir/documents.parquet")
      Dedup.decontaminate(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0), n = 5)
    }),
    "curate_funnel" -> ((s, dir) => {
      graft.ops.Curate.funnel(s.read.parquet(s"$dir/documents.parquet"), Seq(
        "min_chars" -> (length(col("text")) >= 50),
        "lang_whitelist" -> col("lang").isin("en", "de", "es", "fr"),
        "min_tokens" -> (size(Dedup.toksC(col("text"))) >= 10)))
    }),

    "text_redact" -> ((s, dir) => {
      // deterministic PII suffix (by doc_id % 3) so the oracle reproduces
      // both the redacted text and the per-category counts literally
      TextOps.redact(s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), concat(col("text"),
          element_at(array(
            lit(" contact alice@example.com or 10.0.0.1"),
            lit(" ref 9876543210 bob.smith@test.org"),
            lit(" no pii appended here")),
            (col("doc_id") % 3).cast("int") + 1)).as("text")))
    }),

    // ---- text analysis ----
    "text_token_counts" -> ((s, dir) => TextOps.tokenCounts(s.read.parquet(s"$dir/documents.parquet"))),
    "text_quality" -> ((s, dir) => TextOps.qualityScore(s.read.parquet(s"$dir/documents.parquet"))),
    "text_langid" -> ((s, dir) => TextOps.langId(s.read.parquet(s"$dir/documents.parquet"))),
    "text_fingerprint" -> ((s, dir) => TextOps.fingerprint(s.read.parquet(s"$dir/documents.parquet"))),
    "text_repetition" -> ((s, dir) => TextOps.repetitionSignals(s.read.parquet(s"$dir/documents.parquet"))),
    "text_dup_windows" -> ((s, dir) => TextOps.dupWindowCoverage(s.read.parquet(s"$dir/documents.parquet"), 10)),
    // reference slice = deterministic 30% of docs (doc_id % 10 < 3); the
    // operator takes ANY train frame — a production run passes its curated
    // reference corpus (the CCNet shape)
    "text_lm_score" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
      TextOps.lmScore(docs.where(org.apache.spark.sql.functions.col("doc_id") % 10 < 3), docs)
    }),

    // ---- multimodal: real PNG generation -> binary column -> real header
    // decode (dims are a stated function of doc_id, so the oracle can
    // assert the decoded values literally) ----
    "mm_meta" -> ((s, dir) => Multimodal.extractMeta(s, s.read.parquet(s"$dir/documents.parquet"))),
    "mm_av_meta" -> ((s, dir) => Multimodal.extractAvMeta(s, s.read.parquet(s"$dir/documents.parquet"))))

  /** Mixture-control rates for the ds_mix gate (lang strata; en is the
    * over-represented stratum being down-sampled). Thresholds interpolate
    * into BOTH the Spark filter and the oracle SQL as the same integer. */
  private val MixRates = Map(
    "en" -> 0.3, "de" -> 1.0, "es" -> 0.8, "fr" -> 1.0, "zh" -> 0.5)

  // ======================= DuckDB oracles =======================

  private val T = Transcripts.DuckdbCte

  private def bm25Select(termsInList: String, nTerms: Int): String =
    s"""$T, q AS (
       |  SELECT tf.doc_id,
       |    sum( ln(1 + ((SELECT n FROM corpus) - df.df + 0.5) / (df.df + 0.5))
       |       * tf.tf * (1.2 + 1) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / (SELECT avgdl FROM corpus))) ) AS score,
       |    count(*) AS nt
       |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
       |  WHERE tf.term IN ($termsInList)
       |  GROUP BY 1 HAVING count(*) = $nTerms)""".stripMargin

  private val minhashCols: String = (0 until Dedup.NumHashes)
    .map(j => s"min((h * ${Dedup.hashA(j)} + ${Dedup.hashB(j)}) % ${Dedup.MinhashP}) AS mh$j")
    .mkString(", ")
  private def bandSig(b: Int): String = (0 until Dedup.BandRows)
    .map(r => s"CAST(mh${b * Dedup.BandRows + r} AS VARCHAR)").mkString(" || '-' || ")
  private val bandsUnion: String = (0 until Dedup.NumHashes / Dedup.BandRows)
    .map(b => s"SELECT doc_id, $b AS band, ${bandSig(b)} AS sig FROM mh").mkString(" UNION ALL ")

  /** Shared by dedup_keepers (batch operator) and dedup_keepers_store (the
    * continuously-maintained KeeperStore assignment) — identical pair
    * semantics must yield identical components, so both gates state the
    * same recursive-reachability oracle.
    *
    * Scope note: the walk fixpoint materializes every (vertex, reachable
    * label) pair, so its cost is quadratic in component size — tractable on
    * the gate corpus (sf0.01: largest component 150), intractable on
    * near-clique giants (sf0.1 grows a 2148-member component; DuckDB burns
    * hours there). sf0.1 self-validation therefore checks keepers by
    * union-find over the separately-oracle-checked dedup_minhash_lsh pair
    * table instead of re-running this SQL. */
  private val keepersOracleSql: String =
    s"""WITH RECURSIVE tok AS (
       |  SELECT DISTINCT doc_id, tt.term
       |  FROM documents, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tt(term)
       |  WHERE length(tt.term) BETWEEN 2 AND 40),
       |hh AS (SELECT doc_id, CAST(('0x' || substr(md5(term), 1, 7)) AS BIGINT) AS h FROM tok),
       |mh AS (SELECT doc_id, $minhashCols FROM hh GROUP BY 1),
       |bands AS ($bandsUnion),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x
       |  JOIN bands y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
       |ts AS (SELECT doc_id, list(term ORDER BY term) AS ts FROM tok GROUP BY 1),
       |pairs AS (
       |  SELECT cand.a, cand.b
       |  FROM cand JOIN ts ta ON cand.a = ta.doc_id JOIN ts tb ON cand.b = tb.doc_id
       |  WHERE CAST(len(list_intersect(ta.ts, tb.ts)) AS DOUBLE) /
       |        CAST(len(list_distinct(list_concat(ta.ts, tb.ts))) AS DOUBLE) >= 0.95),
       |edges AS (SELECT a AS u, b AS v FROM pairs UNION ALL SELECT b AS u, a AS v FROM pairs),
       |walk(v, lbl) AS (
       |  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t0
       |  UNION
       |  SELECT e.u, w.lbl FROM edges e JOIN walk w ON e.v = w.v),
       |comp AS (SELECT v, min(lbl) AS keeper FROM walk GROUP BY v),
       |assigned AS (
       |  SELECT d.doc_id, coalesce(c.keeper, d.doc_id) AS keeper
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.v),
       |sizes AS (SELECT keeper, count(*) AS n_members FROM assigned GROUP BY 1)
       |SELECT a.doc_id, a.keeper, a.doc_id = a.keeper AS is_keeper, s.n_members
       |FROM assigned a JOIN sizes s USING (keeper)
       |ORDER BY doc_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "ft_docids" ->
      s"""$T SELECT doc_id AS docid, conv_id, turn_idx, role, tool FROM t ORDER BY docid""",
    "ft_tokenize" ->
      s"""$T SELECT tf.doc_id AS docid, tf.term, tf.tf, CAST(dl.dl AS INT) AS dl
         |FROM tf JOIN dl ON tf.doc_id = dl.doc_id ORDER BY docid, term""".stripMargin,
    "ft_term_stats" ->
      s"""$T SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS pv
         |FROM tf GROUP BY term ORDER BY term""".stripMargin,
    "ft_search_and" ->
      s"""$T SELECT doc_id AS docid FROM tf WHERE term IN ('spark','merge')
         |GROUP BY doc_id HAVING count(*) = 2 ORDER BY docid""".stripMargin,
    "ft_bm25_single" ->
      s"""${bm25Select("'spark'", 1)}
         |SELECT doc_id AS docid, round(score, 6) AS score_r FROM q ORDER BY docid""".stripMargin,
    "ft_bm25_and2" ->
      s"""${bm25Select("'spark','merge'", 2)}
         |SELECT doc_id AS docid, round(score, 6) AS score_r FROM q ORDER BY docid""".stripMargin,
    "ft_bm25_topk" ->
      s"""${bm25Select("'dup'", 1)}
         |SELECT doc_id AS docid, round(score, 6) AS score_r FROM q
         |ORDER BY round(score, 6) DESC, doc_id LIMIT 30""".stripMargin,
    "ft_fetch_text" ->
      s"""${bm25Select("'dup'", 1)}
         |SELECT q.doc_id AS docid, t.conv_id, t.turn_idx, t.role, t.text,
         |       round(q.score, 6) AS score_r
         |FROM q JOIN t ON q.doc_id = t.doc_id
         |ORDER BY round(q.score, 6) DESC, q.doc_id LIMIT 30""".stripMargin,
    "ft_pvuv" ->
      s"""$T SELECT CAST(count(*) AS BIGINT) AS total, CAST(sum(tf) AS BIGINT) AS pv,
         |CAST(count(*) AS BIGINT) AS uv FROM tf WHERE term = 'spark'""".stripMargin,
    "ft_filter_fetch" ->
      s"""${bm25Select("'dup'", 1)}
         |SELECT q.doc_id AS docid, t.role, round(q.score, 6) AS score_r
         |FROM q JOIN t ON q.doc_id = t.doc_id
         |WHERE t.role = 'user'
         |ORDER BY round(q.score, 6) DESC, q.doc_id LIMIT 30""".stripMargin,
    "px_chain_url" ->
      """WITH v AS (
        |  SELECT doc_id,
        |    ['https://files.data.example.com.cn:9000/pub/' || source || '/item',
        |     'files.data.example.com.cn',
        |     'files.data.example.com.cn:9000',
        |     'example.com.cn:9000',
        |     'data.example.com.cn:9000',
        |     'files.data.example.com.cn:9000/pub',
        |     'pub/' || source,
        |     'files.data.example.com.cn:9000/pub/' || source || '/item'] AS L
        |  FROM documents)
        |SELECT doc_id, CAST(r.i AS INT) AS pos, L[CAST(r.i AS INT) + 1] AS token
        |FROM v, range(8) AS r(i) ORDER BY doc_id, pos""".stripMargin,
    "px_chain_blacklist" ->
      """WITH tl AS (
        |  SELECT doc_id, list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        |    t -> length(t) BETWEEN 2 AND 40 AND t NOT IN ('join','hash','the')) AS L
        |  FROM documents)
        |SELECT doc_id, CAST(z.e['i'] AS INT) AS pos, z.e['t'] AS token FROM (
        |  SELECT doc_id, unnest(list_transform(list_zip(L, range(len(L))),
        |    p -> {'t': p[1], 'i': p[2]})) AS e
        |  FROM tl) z
        |ORDER BY doc_id, pos""".stripMargin,

    // FMM segmentation of the three fixed suffix phrases is unambiguous
    // under this dictionary, so the oracle states it literally; latin
    // tokens are the analyzer-parity regex like the other chain oracles
    "px_chain_cjk" ->
      """WITH lat AS (
        |  SELECT doc_id, list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        |                             t -> length(t) BETWEEN 2 AND 40) AS lt
        |  FROM documents),
        |cjk AS (
        |  SELECT doc_id, CASE CAST(doc_id % 3 AS INT)
        |    WHEN 0 THEN ['中文', '分词']
        |    WHEN 1 THEN ['搜索', '引擎']
        |    ELSE ['数据', '处理'] END AS ct
        |  FROM documents),
        |alltok AS (
        |  SELECT l.doc_id, list_concat(l.lt, c.ct) AS toks
        |  FROM lat l JOIN cjk c ON l.doc_id = c.doc_id)
        |SELECT doc_id, CAST(generate_subscripts(toks, 1) AS INT) - 1 AS pos,
        |       unnest(toks) AS token
        |FROM alltok
        |ORDER BY doc_id, pos""".stripMargin,

    // latin tokens pass the full P6 predicate in SQL (digit/hex/other
    // branches; the Chinese branch never fires on [a-z0-9] tokens); the CJK
    // suffix contributes its two dictionary words — the lone ideograph is
    // dropped by quality (Chinese len < 2), stated literally
    "px_chain_quality" ->
      """WITH lat AS (
        |  SELECT doc_id, list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        |    t -> length(t) BETWEEN 2 AND 40 AND CASE
        |           WHEN regexp_full_match(t, '[0-9]+') THEN length(t) >= 5
        |           WHEN regexp_full_match(t, '0x[0-9a-f]+') THEN length(t) >= 6
        |           ELSE length(t) BETWEEN 4 AND 128 END) AS lt
        |  FROM documents),
        |cjk AS (
        |  SELECT doc_id, CASE CAST(doc_id % 3 AS INT)
        |    WHEN 0 THEN ['中文', '分词']
        |    WHEN 1 THEN ['搜索', '引擎']
        |    ELSE ['数据', '处理'] END AS ct
        |  FROM documents),
        |alltok AS (
        |  SELECT l.doc_id, list_concat(l.lt, c.ct) AS toks
        |  FROM lat l JOIN cjk c ON l.doc_id = c.doc_id)
        |SELECT doc_id, CAST(generate_subscripts(toks, 1) AS INT) - 1 AS pos,
        |       unnest(toks) AS token
        |FROM alltok
        |ORDER BY doc_id, pos""".stripMargin,

    "rel_q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 0) AS sum_base_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "rel_join_agg" ->
      """SELECT n_name, o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |  round(sum(l_extendedprice * (1 - l_discount)), 0) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "rel_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(row_number() OVER w AS INT) AS rn,
        |  sum(l_quantity) OVER w AS run_qty
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY l_suppkey, rn""".stripMargin,
    "rel_topk_orders" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "rel_events_daily" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day, event_type,
        |  CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
        |  CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "stream_hourly_append" ->
      // append mode emits only windows the watermark closed: hour end <=
      // max(ts) - 1 hour (the declared lateness bound)
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
        |  CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
        |FROM events
        |WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= (SELECT max(ts) - INTERVAL 1 HOUR FROM events)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // T3 size-triggered flush: per hour-bucket, items ordered by event_id
    // accumulate (octet_length(props) + 16) bytes; a segment flushes the
    // moment the accumulator reaches 128 ("size", accumulator resets — the
    // reset-running-sum needs the recursive walk below), the remainder
    // flushes only for buckets the final watermark closed ("timeout")
    "stream_sized_flush" ->
      """WITH RECURSIVE ord AS (
        |  SELECT date_trunc('hour', ts) AS h, event_id,
        |         octet_length(CAST(props AS BLOB)) + 16 AS sz,
        |         row_number() OVER (PARTITION BY date_trunc('hour', ts) ORDER BY event_id) AS rn
        |  FROM events
        |),
        |walk AS (
        |  SELECT h, rn, event_id, sz, 0 AS seq, (sz >= 128) AS flush,
        |         CASE WHEN sz >= 128 THEN 0 ELSE sz END AS acc
        |  FROM ord WHERE rn = 1
        |  UNION ALL
        |  SELECT o.h, o.rn, o.event_id, o.sz,
        |         w.seq + CASE WHEN w.flush THEN 1 ELSE 0 END AS seq,
        |         (w.acc + o.sz >= 128) AS flush,
        |         CASE WHEN w.acc + o.sz >= 128 THEN 0 ELSE w.acc + o.sz END AS acc
        |  FROM walk w JOIN ord o ON o.h = w.h AND o.rn = w.rn + 1
        |),
        |segs AS (
        |  SELECT h, seq, count(*) AS n, CAST(sum(sz) AS BIGINT) AS bytes,
        |         min(event_id) AS first_id, max(event_id) AS last_id,
        |         max(CASE WHEN flush THEN 1 ELSE 0 END) = 1 AS has_flush
        |  FROM walk GROUP BY h, seq
        |)
        |SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket, CAST(seq AS INT) AS seq,
        |       n, bytes, first_id, last_id,
        |       CASE WHEN has_flush THEN 'size' ELSE 'timeout' END AS reason
        |FROM segs
        |WHERE has_flush OR h + INTERVAL 1 HOUR < (SELECT max(ts) - INTERVAL 1 HOUR FROM events)
        |ORDER BY bucket, seq""".stripMargin,

    "px_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "px_tab_kv" ->
      """SELECT doc_id,
        |  string_split(lang || chr(9) || source || chr(9) || CAST(n_chars AS VARCHAR), chr(9))[2] AS tab_source,
        |  regexp_extract('<lang=' || lang || '><source=' || source || '>', '<source=([^>]*)>', 1) AS kv_source,
        |  regexp_extract('<lang=' || lang || '><source=' || source || '>', '<lang=([^>]*)>', 1) AS kv_lang
        |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      """WITH h AS (SELECT doc_id, md5(text) AS h FROM documents),
        |k AS (SELECT h, min(doc_id) AS keeper, CAST(count(*) AS BIGINT) AS n_copies FROM h GROUP BY 1)
        |SELECT h.doc_id, h.h, h.doc_id = k.keeper AS is_keeper, k.n_copies
        |FROM h JOIN k USING (h) ORDER BY doc_id""".stripMargin,
    "dedup_jaccard" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, tt.term
        |  FROM documents, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tt(term)
        |  WHERE length(tt.term) BETWEEN 2 AND 40),
        |ts AS (SELECT doc_id, list(term ORDER BY term) AS ts FROM tok GROUP BY 1)
        |SELECT a.doc_id AS a, b.doc_id AS b,
        |  round(CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
        |        CAST(len(list_distinct(list_concat(a.ts, b.ts))) AS DOUBLE), 6) AS j
        |FROM ts a JOIN ts b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
        |      CAST(len(list_distinct(list_concat(a.ts, b.ts))) AS DOUBLE) >= 0.95
        |ORDER BY a, b""".stripMargin,
    // prefix filtering is EXACT: same oracle as the brute-force dedup_jaccard
    "dedup_jaccard_prefix" ->
      """WITH tok AS (
        |  SELECT DISTINCT doc_id, tt.term
        |  FROM documents, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tt(term)
        |  WHERE length(tt.term) BETWEEN 2 AND 40),
        |ts AS (SELECT doc_id, list(term ORDER BY term) AS ts FROM tok GROUP BY 1)
        |SELECT a.doc_id AS a, b.doc_id AS b,
        |  round(CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
        |        CAST(len(list_distinct(list_concat(a.ts, b.ts))) AS DOUBLE), 6) AS j
        |FROM ts a JOIN ts b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
        |      CAST(len(list_distinct(list_concat(a.ts, b.ts))) AS DOUBLE) >= 0.95
        |ORDER BY a, b""".stripMargin,
    // 3-gram shingle Jaccard: l keeps token ORDER (no distinct before the
    // shingle window); DuckDB l[i:i+2] = Spark slice(l, i, 3)
    "dedup_ngram" ->
      """WITH base AS (
        |  SELECT doc_id, list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        |                             t -> length(t) BETWEEN 2 AND 40) AS l
        |  FROM documents),
        |ts AS (
        |  SELECT doc_id, list_sort(list_distinct(
        |    [array_to_string(l[i:i+2], ' ') FOR i IN generate_series(1, len(l) - 2)])) AS ts
        |  FROM base WHERE len(l) >= 3)
        |SELECT a.doc_id AS a, b.doc_id AS b,
        |  round(CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
        |        CAST(len(list_distinct(list_concat(a.ts, b.ts))) AS DOUBLE), 6) AS j
        |FROM ts a JOIN ts b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.ts, b.ts)) AS DOUBLE) /
        |      CAST(len(list_distinct(list_concat(a.ts, b.ts))) AS DOUBLE) >= 0.8
        |ORDER BY a, b""".stripMargin,
    // shingle→minhash→band (the classic order-aware LSH): same signature
    // and band SQL as dedup_minhash_lsh, tok CTE = 3-gram shingles
    "dedup_ngram_lsh" ->
      s"""WITH base AS (
         |  SELECT doc_id, list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
         |                             t -> length(t) BETWEEN 2 AND 40) AS l
         |  FROM documents),
         |tok AS (
         |  SELECT DISTINCT doc_id,
         |    unnest([array_to_string(l[i:i+2], ' ') FOR i IN generate_series(1, len(l) - 2)]) AS term
         |  FROM base WHERE len(l) >= 3),
         |hh AS (SELECT doc_id, CAST(('0x' || substr(md5(term), 1, 7)) AS BIGINT) AS h FROM tok),
         |mh AS (SELECT doc_id, $minhashCols FROM hh GROUP BY 1),
         |bands AS ($bandsUnion),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x
         |  JOIN bands y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
         |ts AS (SELECT doc_id, list(term ORDER BY term) AS ts FROM tok GROUP BY 1)
         |SELECT cand.a, cand.b,
         |  round(CAST(len(list_intersect(ta.ts, tb.ts)) AS DOUBLE) /
         |        CAST(len(list_distinct(list_concat(ta.ts, tb.ts))) AS DOUBLE), 6) AS j
         |FROM cand JOIN ts ta ON cand.a = ta.doc_id JOIN ts tb ON cand.b = tb.doc_id
         |WHERE CAST(len(list_intersect(ta.ts, tb.ts)) AS DOUBLE) /
         |      CAST(len(list_distinct(list_concat(ta.ts, tb.ts))) AS DOUBLE) >= 0.8
         |ORDER BY a, b""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, tt.term
         |  FROM documents, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tt(term)
         |  WHERE length(tt.term) BETWEEN 2 AND 40),
         |hh AS (SELECT doc_id, CAST(('0x' || substr(md5(term), 1, 7)) AS BIGINT) AS h FROM tok),
         |mh AS (SELECT doc_id, $minhashCols FROM hh GROUP BY 1),
         |bands AS ($bandsUnion),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x
         |  JOIN bands y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
         |ts AS (SELECT doc_id, list(term ORDER BY term) AS ts FROM tok GROUP BY 1)
         |SELECT cand.a, cand.b,
         |  round(CAST(len(list_intersect(ta.ts, tb.ts)) AS DOUBLE) /
         |        CAST(len(list_distinct(list_concat(ta.ts, tb.ts))) AS DOUBLE), 6) AS j
         |FROM cand JOIN ts ta ON cand.a = ta.doc_id JOIN ts tb ON cand.b = tb.doc_id
         |WHERE CAST(len(list_intersect(ta.ts, tb.ts)) AS DOUBLE) /
         |      CAST(len(list_distinct(list_concat(ta.ts, tb.ts))) AS DOUBLE) >= 0.95
         |ORDER BY a, b""".stripMargin,
    // same signature/band/verify SQL as dedup_minhash_lsh, scoped to pairs
    // involving the fresh docId suffix: a < b makes that exactly b >= 400
    "dedup_lsh_incr" ->
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, tt.term
         |  FROM documents, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tt(term)
         |  WHERE length(tt.term) BETWEEN 2 AND 40),
         |hh AS (SELECT doc_id, CAST(('0x' || substr(md5(term), 1, 7)) AS BIGINT) AS h FROM tok),
         |mh AS (SELECT doc_id, $minhashCols FROM hh GROUP BY 1),
         |bands AS ($bandsUnion),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x
         |  JOIN bands y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
         |ts AS (SELECT doc_id, list(term ORDER BY term) AS ts FROM tok GROUP BY 1)
         |SELECT cand.a, cand.b,
         |  round(CAST(len(list_intersect(ta.ts, tb.ts)) AS DOUBLE) /
         |        CAST(len(list_distinct(list_concat(ta.ts, tb.ts))) AS DOUBLE), 6) AS j
         |FROM cand JOIN ts ta ON cand.a = ta.doc_id JOIN ts tb ON cand.b = tb.doc_id
         |WHERE CAST(len(list_intersect(ta.ts, tb.ts)) AS DOUBLE) /
         |      CAST(len(list_distinct(list_concat(ta.ts, tb.ts))) AS DOUBLE) >= 0.95
         |  AND cand.b >= 400
         |ORDER BY a, b""".stripMargin,

    // the store-backed streaming path emits exactly the pairs touching the
    // fresh suffix — same oracle as dedup_lsh_incr (b >= 400)
    "dedup_store_incr" ->
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, tt.term
         |  FROM documents, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tt(term)
         |  WHERE length(tt.term) BETWEEN 2 AND 40),
         |hh AS (SELECT doc_id, CAST(('0x' || substr(md5(term), 1, 7)) AS BIGINT) AS h FROM tok),
         |mh AS (SELECT doc_id, $minhashCols FROM hh GROUP BY 1),
         |bands AS ($bandsUnion),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM bands x
         |  JOIN bands y ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
         |ts AS (SELECT doc_id, list(term ORDER BY term) AS ts FROM tok GROUP BY 1)
         |SELECT cand.a, cand.b,
         |  round(CAST(len(list_intersect(ta.ts, tb.ts)) AS DOUBLE) /
         |        CAST(len(list_distinct(list_concat(ta.ts, tb.ts))) AS DOUBLE), 6) AS j
         |FROM cand JOIN ts ta ON cand.a = ta.doc_id JOIN ts tb ON cand.b = tb.doc_id
         |WHERE CAST(len(list_intersect(ta.ts, tb.ts)) AS DOUBLE) /
         |      CAST(len(list_distinct(list_concat(ta.ts, tb.ts))) AS DOUBLE) >= 0.95
         |  AND cand.b >= 400
         |ORDER BY a, b""".stripMargin,

    // keeper assignment: connected components over the dedup_minhash_lsh
    // pair graph (same tok/band/verify SQL), components via a recursive
    // reachability walk — lbl(v) = min vertex reachable from v
    "dedup_keepers" -> keepersOracleSql,
    // store-maintained continuous assignment == the batch operator
    "dedup_keepers_store" -> keepersOracleSql,

    // split/sample assignment is a pure function of doc_id via the same
    // md5-derived 28-bit hash the dedup family uses — both sides literal
    "ds_split" ->
      """SELECT doc_id, CASE
        |  WHEN CAST(('0x' || substr(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 100 < 80 THEN 'train'
        |  WHEN CAST(('0x' || substr(md5('split-' || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 100 < 90 THEN 'val'
        |  ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ds_sample" ->
      """SELECT doc_id FROM documents
        |WHERE CAST(('0x' || substr(md5('sample-' || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 20 = 0
        |ORDER BY doc_id""".stripMargin,

    "ds_mix" -> {
      val cases = MixRates.toSeq.sortBy(_._1).map { case (s, r) =>
        s"WHEN '$s' THEN ${graft.ops.Sampling.thresholdPerMillion(r)}"
      }.mkString(" ")
      s"""SELECT doc_id, lang AS stratum FROM documents
         |WHERE CAST(('0x' || substr(md5('mix-' || CAST(doc_id AS VARCHAR)), 1, 7)) AS BIGINT) % 1000000 <
         |  CASE lang $cases ELSE 0 END
         |ORDER BY doc_id""".stripMargin
    },

    // 5-gram decontamination vs the every-50th-doc "benchmark"; n_hits =
    // distinct shared shingles per training doc
    "decontam" ->
      """WITH base AS (
        |  SELECT doc_id, list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        |                             t -> length(t) BETWEEN 2 AND 40) AS l
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest([array_to_string(l[i:i+4], ' ') FOR i IN generate_series(1, len(l) - 4)]) AS sh
        |  FROM base WHERE len(l) >= 5),
        |bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0),
        |hits AS (
        |  SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_hits
        |  FROM sh s JOIN bench b ON s.sh = b.sh
        |  WHERE s.doc_id % 50 <> 0 GROUP BY 1)
        |SELECT d.doc_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
        |       COALESCE(h.n_hits, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        |WHERE d.doc_id % 50 <> 0
        |ORDER BY d.doc_id""".stripMargin,

    "curate_funnel" ->
      """WITH f AS (
        |  SELECT length(text) >= 50 AS c0,
        |         lang IN ('en','de','es','fr') AS c1,
        |         len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        |             t -> length(t) BETWEEN 2 AND 40)) >= 10 AS c2
        |  FROM documents)
        |SELECT CAST(0 AS INT) AS stage_idx, 'min_chars' AS stage,
        |       CAST(count(*) AS BIGINT) AS n_in,
        |       CAST(sum(CASE WHEN c0 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept FROM f
        |UNION ALL
        |SELECT CAST(1 AS INT), 'lang_whitelist',
        |       CAST(sum(CASE WHEN c0 THEN 1 ELSE 0 END) AS BIGINT),
        |       CAST(sum(CASE WHEN c0 AND c1 THEN 1 ELSE 0 END) AS BIGINT) FROM f
        |UNION ALL
        |SELECT CAST(2 AS INT), 'min_tokens',
        |       CAST(sum(CASE WHEN c0 AND c1 THEN 1 ELSE 0 END) AS BIGINT),
        |       CAST(sum(CASE WHEN c0 AND c1 AND c2 THEN 1 ELSE 0 END) AS BIGINT) FROM f
        |ORDER BY stage_idx""".stripMargin,

    // contiguous sequence packing: exclusive prefix sum of analyzer token
    // counts in doc_id order; pack = integer div of the doc's start offset
    "text_pack" ->
      """WITH tc AS (
        |  SELECT doc_id, CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        |       t -> length(t) BETWEEN 2 AND 40)) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tok_start
        |  FROM tc)
        |SELECT doc_id, n_tokens, tok_start, tok_start // 256 AS pack_id
        |FROM c ORDER BY doc_id""".stripMargin,

    "dedup_simhash" ->
      """WITH tok AS (
        |  SELECT doc_id, tt.term
        |  FROM documents, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tt(term)
        |  WHERE length(tt.term) BETWEEN 2 AND 40),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |hh AS (SELECT doc_id, tf, CAST(('0x' || substr(md5(term), 1, 7)) AS BIGINT) AS h FROM tf),
        |bits AS (
        |  SELECT doc_id, r.b, sum(CASE WHEN (h >> r.b) & 1 = 1 THEN tf ELSE -tf END) AS s
        |  FROM hh, unnest(range(0, 32)) AS r(b) GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
        |FROM bits GROUP BY 1 ORDER BY 1""".stripMargin,

    // near-dup pairs at Hamming <= 3 over the same signatures; the oracle
    // brute-forces all pairs (exact contract, so the pigeonhole block joins
    // must reproduce it row for row)
    "dedup_simhash_near" ->
      """WITH tok AS (
        |  SELECT doc_id, tt.term
        |  FROM documents, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tt(term)
        |  WHERE length(tt.term) BETWEEN 2 AND 40),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |hh AS (SELECT doc_id, tf, CAST(('0x' || substr(md5(term), 1, 7)) AS BIGINT) AS h FROM tf),
        |bits AS (
        |  SELECT doc_id, r.b, sum(CASE WHEN (h >> r.b) & 1 = 1 THEN tf ELSE -tf END) AS s
        |  FROM hh, unnest(range(0, 32)) AS r(b) GROUP BY 1, 2),
        |sigs AS (
        |  SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY 1)
        |SELECT a.doc_id AS a, b.doc_id AS b,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hd
        |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        |ORDER BY a, b""".stripMargin,

    // the 60-bit production-width form (15 md5 hex chars; h32's 7 chars are
    // only 28 bits, leaving sig bits 28-31 dead — see Dedup.h60)
    "dedup_simhash_near_wide" ->
      """WITH tok AS (
        |  SELECT doc_id, tt.term
        |  FROM documents, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tt(term)
        |  WHERE length(tt.term) BETWEEN 2 AND 40),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |hh AS (SELECT doc_id, tf, CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) AS h FROM tf),
        |bits AS (
        |  SELECT doc_id, r.b, sum(CASE WHEN (h >> r.b) & 1 = 1 THEN tf ELSE -tf END) AS s
        |  FROM hh, unnest(range(0, 60)) AS r(b) GROUP BY 1, 2),
        |sigs AS (
        |  SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY 1)
        |SELECT a.doc_id AS a, b.doc_id AS b,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hd
        |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        |ORDER BY a, b""".stripMargin,

    "ann_cosine_top10" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |s AS (
        |  SELECT e.vec_id, e.label,
        |    list_reduce(list_transform(list_zip(e.embedding, (SELECT qe FROM q)),
        |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (a, b) -> a + b) AS dot,
        |    sqrt(list_reduce(list_transform(e.embedding,
        |      v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (a, b) -> a + b)) AS na,
        |    (SELECT sqrt(list_reduce(list_transform(qe,
        |      v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (a, b) -> a + b)) FROM q) AS nb
        |  FROM embeddings e WHERE e.vec_id <> 0)
        |SELECT vec_id, label, round(dot / (na * nb), 6) AS cos
        |FROM s ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,
    "dedup_embed" ->
      """WITH s AS (
        |  SELECT a.vec_id AS a, b.vec_id AS b,
        |    list_reduce(list_transform(list_zip(a.embedding, b.embedding),
        |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p, q) -> p + q) /
        |    (sqrt(list_reduce(list_transform(a.embedding,
        |      v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (p, q) -> p + q)) *
        |     sqrt(list_reduce(list_transform(b.embedding,
        |      v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (p, q) -> p + q))) AS cos
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |SELECT a, b, round(cos, 6) AS cos FROM s WHERE cos >= 0.4 ORDER BY a, b""".stripMargin,
    "dedup_embed_ann" -> {
      val bitCols = (0 until Similarity.SigBits).map { j =>
        s"""CASE WHEN list_reduce(list_transform(list_zip(embedding, range(0, len(embedding))),
           |  x -> CAST(x[1] AS DOUBLE) *
           |    CASE WHEN CAST(('0x' || substr(md5('hp-$j-' || CAST(x[2] AS VARCHAR)), 1, 1)) AS INT) % 2 = 0
           |         THEN 1.0 ELSE -1.0 END), (a, b) -> a + b) > 0 THEN ${1 << j} ELSE 0 END""".stripMargin
      }.mkString(" + ")
      s"""WITH bk AS (SELECT vec_id, embedding, ($bitCols) AS bucket FROM embeddings),
         |s AS (
         |  SELECT x.vec_id AS a, y.vec_id AS b, x.bucket,
         |    list_reduce(list_transform(list_zip(x.embedding, y.embedding),
         |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (p, q) -> p + q) /
         |    (sqrt(list_reduce(list_transform(x.embedding,
         |      v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (p, q) -> p + q)) *
         |     sqrt(list_reduce(list_transform(y.embedding,
         |      v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (p, q) -> p + q))) AS cos
         |  FROM bk x JOIN bk y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
         |SELECT a, b, CAST(bucket AS INT) AS bucket, round(cos, 6) AS cos
         |FROM s WHERE cos >= 0.4 ORDER BY a, b""".stripMargin
    },
    "ann_lsh_buckets" -> {
      val bitCols = (0 until Similarity.SigBits).map { j =>
        s"""CASE WHEN list_reduce(list_transform(list_zip(embedding, range(0, len(embedding))),
           |  x -> CAST(x[1] AS DOUBLE) *
           |    CASE WHEN CAST(('0x' || substr(md5('hp-$j-' || CAST(x[2] AS VARCHAR)), 1, 1)) AS INT) % 2 = 0
           |         THEN 1.0 ELSE -1.0 END), (a, b) -> a + b) > 0 THEN ${1 << j} ELSE 0 END""".stripMargin
      }.mkString(" + ")
      s"""SELECT bucket, CAST(count(*) AS BIGINT) AS n, min(vec_id) AS min_vec FROM (
         |  SELECT vec_id, ($bitCols) AS bucket FROM embeddings)
         |GROUP BY bucket ORDER BY bucket""".stripMargin
    },

    // IVF centroids = the 16 lowest-vec_id vectors (deterministic coarse
    // quantizer, Lloyd refinement orthogonal to the contract); assignment =
    // argmin L2 with ties to the lower centroid id — FP shapes identical on
    // both sides (dim-ascending left folds)
    "ann_ivf_buckets" ->
      """WITH c AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, embedding AS ce
        |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
        |d AS (
        |  SELECT e.vec_id, c.cid,
        |    list_reduce(list_transform(list_zip(e.embedding, c.ce),
        |      z -> (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)) * (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))),
        |      (a, b) -> a + b) AS d2
        |  FROM embeddings e CROSS JOIN c),
        |a AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d)
        |  WHERE rn = 1)
        |SELECT cid AS centroid, CAST(count(*) AS BIGINT) AS n, min(vec_id) AS min_vec
        |FROM a GROUP BY 1 ORDER BY 1""".stripMargin,
    "ann_ivf_top10" ->
      """WITH c AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, embedding AS ce
        |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 16)),
        |d AS (
        |  SELECT e.vec_id, c.cid,
        |    list_reduce(list_transform(list_zip(e.embedding, c.ce),
        |      z -> (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE)) * (CAST(z[1] AS DOUBLE) - CAST(z[2] AS DOUBLE))),
        |      (a, b) -> a + b) AS d2
        |  FROM embeddings e CROSS JOIN c),
        |a AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM d)
        |  WHERE rn = 1),
        |probes AS (SELECT cid FROM d WHERE vec_id = 0 ORDER BY d2, cid LIMIT 4),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |s AS (
        |  SELECT e.vec_id, e.label, a.cid AS centroid,
        |    list_reduce(list_transform(list_zip(e.embedding, (SELECT qe FROM q)),
        |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), (p, r) -> p + r) /
        |    (sqrt(list_reduce(list_transform(e.embedding,
        |      v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (p, r) -> p + r)) *
        |     (SELECT sqrt(list_reduce(list_transform(qe,
        |      v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (p, r) -> p + r)) FROM q)) AS cos
        |  FROM embeddings e JOIN a USING (vec_id)
        |  WHERE a.cid IN (SELECT cid FROM probes))
        |SELECT vec_id, label, centroid, round(cos, 6) AS cos
        |FROM s ORDER BY cos DESC, vec_id LIMIT 10""".stripMargin,

    // the regex strings interpolate from TextOps.RedactPatterns, so both
    // engines apply byte-identical patterns; counts taken after the prior
    // category's replacement, exactly like the operator
    "text_redact" -> {
      val Seq((_, ePat, eRep), (_, iPat, iRep), (_, nPat, nRep)) = TextOps.RedactPatterns
      s"""WITH r0 AS (
         |  SELECT doc_id, text || CASE CAST(doc_id % 3 AS INT)
         |    WHEN 0 THEN ' contact alice@example.com or 10.0.0.1'
         |    WHEN 1 THEN ' ref 9876543210 bob.smith@test.org'
         |    ELSE ' no pii appended here' END AS t0
         |  FROM documents),
         |r1 AS (SELECT doc_id, CAST(len(regexp_extract_all(t0, '$ePat')) AS INT) AS n_email,
         |              regexp_replace(t0, '$ePat', '$eRep', 'g') AS t1 FROM r0),
         |r2 AS (SELECT doc_id, n_email, CAST(len(regexp_extract_all(t1, '$iPat')) AS INT) AS n_ip,
         |              regexp_replace(t1, '$iPat', '$iRep', 'g') AS t2 FROM r1),
         |r3 AS (SELECT doc_id, n_email, n_ip, CAST(len(regexp_extract_all(t2, '$nPat')) AS INT) AS n_num,
         |              regexp_replace(t2, '$nPat', '$nRep', 'g') AS t3 FROM r2)
         |SELECT doc_id, t3 AS text_red, n_email, n_ip, n_num FROM r3 ORDER BY doc_id""".stripMargin
    },

    "text_token_counts" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS ws_tokens,
        |  CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        |       t -> length(t) BETWEEN 2 AND 40)) AS INT) AS re_tokens,
        |  CAST(length(text) AS INT) AS n_chars_computed,
        |  n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      s"""WITH tok AS (
         |  SELECT doc_id, tt.term
         |  FROM documents, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tt(term)
         |  WHERE length(tt.term) BETWEEN 2 AND 40),
         |st AS (
         |  SELECT doc_id, CAST(count(*) AS DOUBLE) AS n,
         |    CAST(sum(CASE WHEN term IN ${TextOps.StopwordsSql} THEN 1 ELSE 0 END) AS DOUBLE) AS n_stop,
         |    CAST(count(DISTINCT term) AS DOUBLE) AS nd
         |  FROM tok GROUP BY 1)
         |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
         |  round(n_stop / n, 6) AS stop_ratio,
         |  round(nd / n, 6) AS distinct_ratio,
         |  round(least(n / 64.0, 1.0) * 0.4 + (1.0 - n_stop / n) * 0.3 + (nd / n) * 0.3, 6) AS quality
         |FROM st ORDER BY doc_id""".stripMargin,
    "text_langid" -> {
      val scoreCols = TextOps.LangStops.map { case (lang, stops) =>
        val inList = stops.map(s => s"'$s'").mkString(",")
        s"CAST(sum(CASE WHEN term IN ($inList) THEN 1 ELSE 0 END) AS DOUBLE) / greatest(CAST(count(*) AS DOUBLE), 1.0) AS s_$lang"
      }.mkString(", ")
      val langs = TextOps.LangStops.map(_._1)
      val maxExpr = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
      val caseExpr = langs.map(l => s"WHEN s_$l = mx AND mx > 0 THEN '$l'").mkString(" ")
      s"""WITH tok AS (
         |  SELECT doc_id, tt.term
         |  FROM documents, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tt(term)
         |  WHERE length(tt.term) BETWEEN 2 AND 40),
         |sc AS (SELECT doc_id, $scoreCols FROM tok GROUP BY 1),
         |mx AS (SELECT *, $maxExpr AS mx FROM sc)
         |SELECT m.doc_id, d.lang AS lang_label,
         |  CASE $caseExpr ELSE 'und' END AS lang_pred,
         |  round(mx, 6) AS lang_score
         |FROM mx m JOIN documents d ON m.doc_id = d.doc_id ORDER BY m.doc_id""".stripMargin
    },
    "text_fingerprint" ->
      """WITH ts AS (
        |  SELECT doc_id, list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        |    t -> length(t) BETWEEN 2 AND 40) AS ts FROM documents),
        |sh AS (
        |  SELECT doc_id, sss.shingle FROM ts,
        |    unnest(list_transform(range(0, greatest(len(ts) - 5, 0) + 1),
        |      i -> array_to_string(list_slice(ts, i + 1, i + 5), ' '))) AS sss(shingle)),
        |hh AS (SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 7)) AS BIGINT) AS h FROM sh)
        |SELECT doc_id, min(h) AS fp_min, max(h) AS fp_max, CAST(count(*) AS BIGINT) AS n_shingles
        |FROM hh GROUP BY 1 ORDER BY 1""".stripMargin,

    // positional k-gram repetition: denominators are k-gram SLOT counts
    // (n-k+1), numerators the tf of the modal token/bigram and the total tf
    // mass of trigrams occurring more than once — mirrors
    // TextOps.repetitionSignals 1:1 (same filtered token list, so gram
    // positions are post-filter on both sides)
    "text_repetition" ->
      """WITH base AS (
        |  SELECT doc_id, list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        |                             t -> length(t) BETWEEN 2 AND 40) AS l
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, max(c) AS mx FROM (
        |    SELECT doc_id, tok, count(*) AS c
        |    FROM (SELECT doc_id, unnest(l) AS tok FROM base) GROUP BY 1, 2) GROUP BY 1),
        |btf AS (
        |  SELECT doc_id, max(c) AS mxb FROM (
        |    SELECT doc_id, bg, count(*) AS c
        |    FROM (SELECT doc_id, unnest([array_to_string(l[i:i+1], ' ')
        |                                 FOR i IN generate_series(1, len(l) - 1)]) AS bg
        |          FROM base) GROUP BY 1, 2) GROUP BY 1),
        |ttf AS (
        |  SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup FROM (
        |    SELECT doc_id, tg, count(*) AS c
        |    FROM (SELECT doc_id, unnest([array_to_string(l[i:i+2], ' ')
        |                                 FOR i IN generate_series(1, len(l) - 2)]) AS tg
        |          FROM base) GROUP BY 1, 2) GROUP BY 1)
        |SELECT b.doc_id,
        |  CAST(len(b.l) AS INT) AS n_tokens,
        |  round(CASE WHEN len(b.l) >= 1
        |    THEN CAST(coalesce(tf.mx, 0) AS DOUBLE) / len(b.l) ELSE 0.0 END, 6) AS top_token_frac,
        |  round(CASE WHEN len(b.l) >= 2
        |    THEN CAST(coalesce(btf.mxb, 0) AS DOUBLE) / (len(b.l) - 1) ELSE 0.0 END, 6) AS top_bigram_frac,
        |  round(CASE WHEN len(b.l) >= 3
        |    THEN CAST(coalesce(ttf.dup, 0) AS DOUBLE) / (len(b.l) - 2) ELSE 0.0 END, 6) AS dup_trigram_frac
        |FROM base b LEFT JOIN tf USING (doc_id) LEFT JOIN btf USING (doc_id)
        |  LEFT JOIN ttf USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // fixed-window exact substring dedup: a window duplicates when its
    // 10-token string occurs at >= 2 positions corpus-wide; coverage per doc
    "text_dup_windows" ->
      """WITH base AS (
        |  SELECT doc_id, list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        |                             t -> length(t) BETWEEN 2 AND 40) AS l
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, unnest([array_to_string(l[i:i+9], ' ')
        |                         FOR i IN generate_series(1, len(l) - 9)]) AS g
        |  FROM base),
        |cnt AS (SELECT g, count(*) AS c FROM g GROUP BY 1),
        |per AS (
        |  SELECT doc_id, count(*) AS nw,
        |    sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS nd
        |  FROM g JOIN cnt USING (g) GROUP BY 1)
        |SELECT b.doc_id,
        |  CAST(coalesce(per.nw, 0) AS BIGINT) AS n_windows,
        |  CAST(coalesce(per.nd, 0) AS BIGINT) AS n_dup_windows,
        |  round(CASE WHEN coalesce(per.nw, 0) >= 1
        |    THEN CAST(per.nd AS DOUBLE) / per.nw ELSE 0.0 END, 6) AS dup_frac
        |FROM base b LEFT JOIN per USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // bigram-LM score vs the doc_id%10<3 reference slice; per-position
    // probabilities quantized to micro-integers in BOTH engines (see
    // TextOps.lmScore scaladoc) so the per-doc sum is order-free
    "text_lm_score" ->
      """WITH base AS (
        |  SELECT doc_id, list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
        |                             t -> length(t) BETWEEN 2 AND 40) AS l
        |  FROM documents),
        |tok AS (SELECT doc_id, unnest(l) AS term FROM base),
        |big AS (
        |  SELECT doc_id,
        |    unnest([array_to_string(l[i:i+1], ' ') FOR i IN generate_series(1, len(l) - 1)]) AS big,
        |    unnest([l[i] FOR i IN generate_series(1, len(l) - 1)]) AS prev,
        |    unnest([l[i+1] FOR i IN generate_series(1, len(l) - 1)]) AS cur
        |  FROM base),
        |c1 AS (SELECT term, count(*) AS c1 FROM tok WHERE doc_id % 10 < 3 GROUP BY 1),
        |c2 AS (SELECT big, count(*) AS c2 FROM big WHERE doc_id % 10 < 3 GROUP BY 1),
        |tot AS (SELECT count(*) AS t FROM tok WHERE doc_id % 10 < 3),
        |sc AS (
        |  SELECT b.doc_id,
        |    CASE WHEN c2.c2 IS NOT NULL THEN CAST(round(1000000.0 * c2.c2 / c1p.c1) AS BIGINT)
        |         WHEN c1c.c1 IS NOT NULL THEN CAST(round(400000.0 * c1c.c1 / (SELECT t FROM tot)) AS BIGINT)
        |         ELSE 0 END AS p_micro,
        |    CASE WHEN c2.c2 IS NOT NULL THEN 1 ELSE 0 END AS hit,
        |    CASE WHEN c1c.c1 IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM big b
        |  LEFT JOIN c2 USING (big)
        |  LEFT JOIN c1 c1p ON b.prev = c1p.term
        |  LEFT JOIN c1 c1c ON b.cur = c1c.term),
        |per AS (SELECT doc_id, count(*) AS nb, sum(hit) AS nh, sum(oov) AS no, sum(p_micro) AS sp
        |        FROM sc GROUP BY 1)
        |SELECT b.doc_id,
        |  CAST(coalesce(per.nb, 0) AS BIGINT) AS n_bigrams,
        |  round(CASE WHEN per.nb >= 1 THEN CAST(per.nh AS DOUBLE) / per.nb ELSE 0.0 END, 6) AS hit_frac,
        |  round(CASE WHEN per.nb >= 1 THEN CAST(per.no AS DOUBLE) / per.nb ELSE 0.0 END, 6) AS oov_frac,
        |  CAST(round(CASE WHEN per.nb >= 1 THEN CAST(per.sp AS DOUBLE) / per.nb ELSE 0.0 END) AS BIGINT) AS lm_micro
        |FROM base b LEFT JOIN per USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // the Spark side encodes a REAL PNG per doc (ImageIO) and parses its
    // IHDR back; width/height follow the generator's stated doc_id law, so
    // the oracle holds the round-trip to account without re-encoding bytes
    "mm_meta" ->
      """SELECT doc_id, 'png' AS fmt,
        |  CAST(16 + doc_id % 17 AS INT) AS width,
        |  CAST(16 + doc_id % 23 AS INT) AS height,
        |  CAST(1 AS INT) AS frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the Spark side builds a REAL PCM WAV (even doc_ids) or MP4 moov (odd)
    // per doc and walks the RIFF chunks / ISO-BMFF boxes back; every field
    // follows the generator's stated doc_id law (integer-exact durations)
    "mm_av_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'mp4' END AS fmt,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 8000 * (1 + doc_id % 3) ELSE 0 END AS INT) AS sample_rate,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + (doc_id % 4) // 2 ELSE 0 END AS INT) AS channels,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 + doc_id % 29 ELSE 100 * (1 + doc_id % 50) END AS BIGINT) AS duration_ms,
        |  CAST(CASE WHEN doc_id % 2 = 1 THEN 320 + 16 * (doc_id % 8) ELSE 0 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 2 = 1 THEN 240 + 16 * (doc_id % 5) ELSE 0 END AS INT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin)
}
