package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted keeper assignment for the streaming-dedup layer — the
  * continuous form of [[Dedup.keepers]]: as micro-batches of near-dup
  * pairs arrive ([[graft.streaming.StreamDedup]]), the store maintains
  * enough state that "which docs do I keep" is answerable at any moment
  * without ever recomputing components over the cumulative pair history.
  *
  * Design — append-only labels + CONTRACTED merge edges:
  *   labels/batch_id=N/bucket=K/   (doc_id LONG, lbl LONG)
  *   merges/batch_id=N/            (u LONG, v LONG)
  * A doc's `lbl` is its component representative AS OF THE LAST COMPACTION
  * (own id at ingest — fresh docs are always written (doc_id, doc_id)).
  * Each batch appends one merge edge per near-dup pair, with both endpoints
  * pre-resolved to their CURRENT representative (stored label, then through
  * the live merge graph), so the edge connects components, not raw docs.
  * The final assignment is labels ⋈ components(live merges): keeper =
  * root(lbl) if lbl was ever merged, else lbl itself. Pre-resolution makes
  * the live merge graph a contraction of the real pair graph, so
  * components over it equal components over all pairs ever emitted
  * (KeeperStoreSpec asserts equality with [[Dedup.keepersFromPairs]] after
  * every batch).
  *
  * Scale shape, per batch: the labels lookup broadcasts the (candidate-
  * scale) stale endpoint set against a BUCKET-PRUNED labels scan
  * (partitioned by doc_id mod [[LabelBuckets]] — the store side never
  * shuffles); the component resolve runs over the live merge edges only,
  * which compaction keeps small (merges accumulated since the last
  * compact, not since the beginning of time). [[compact]] bakes resolved
  * keepers into the labels rows and deletes the folded edges — after it,
  * reads and updates start from a merge graph of size 0 again. Everything
  * is idempotent per batch (dynamic partition overwrite keyed by batch_id,
  * resolution always EXCLUDES the in-flight batch's own partitions), so
  * StreamDedup's crash-replay contract carries over unchanged.
  *
  * Determinism: representative = min doc_id reachable, every step a
  * min-aggregation — same contract as [[Dedup.exact]] and
  * [[Dedup.keepers]]. */
object KeeperStore {

  /** Label-table partition fan-out (pruning granularity vs files-per-append
    * — same trade-off as SignatureStore.BandBuckets, larger here because
    * the table is 2 slim longs per row). */
  val LabelBuckets = 64

  private val CompactedBatchId = -1L

  private def manifestPath(dir: String) = s"$dir/_compact_manifest.json"

  /** True when `path` holds at least one batch_id= partition — a parquet
    * read of a partition-less dir (possible after a full compaction, or
    * after an empty-edge write left only _SUCCESS) fails schema inference,
    * so every merge read is guarded by this. */
  private def hasBatchPartitions(path: String): Boolean =
    Option(new java.io.File(path).listFiles())
      .exists(_.exists(_.getName.startsWith("batch_id=")))

  /** Root map (v, root) over the live merge graph, optionally excluding one
    * batch's own partition (update-time resolution during a possible
    * replay). Empty frame when no merges exist yet. */
  private def liveRoots(spark: SparkSession, dir: String,
                        excludeBatch: Option[Long]): DataFrame = {
    val path = s"$dir/merges"
    if (!hasBatchPartitions(path))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("root", org.apache.spark.sql.types.LongType))))
    val m = spark.read.parquet(path)
    val live = excludeBatch.fold(m)(id => m.filter(col("batch_id") =!= lit(id)))
    Dedup.components(live.select(col("u").as("a"), col("v").as("b")))
      .select(col("v"), col("lbl").as("root"))
  }

  /** Ingest one micro-batch: register its docs (keeper = self until merged)
    * and append one contracted merge edge per near-dup pair. `freshPairs`
    * must be this batch's pairs (a < b, b >= freshFrom — StreamDedup's
    * output contract); `batchDocs` needs a doc_id column. Idempotent per
    * batchId. */
  def update(spark: SparkSession, dir: String, batchDocs: DataFrame,
             freshPairs: DataFrame, batchId: Long, freshFrom: Long): Unit = {
    recover(spark, dir) // a half-deleted compaction must not feed lookups
    batchDocs.select(col("doc_id").cast("long").as("doc_id"))
      .withColumn("lbl", col("doc_id"))
      .withColumn("bucket", pmod(col("doc_id"), lit(LabelBuckets.toLong)).cast("int"))
      .withColumn("batch_id", lit(batchId))
      .repartition(col("bucket"))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "bucket").parquet(s"$dir/labels")

    val pairs = freshPairs.select(col("a").cast("long").as("a"),
      col("b").cast("long").as("b"))
    // resolve the stale side (a < freshFrom) to its current representative:
    // stored label (bucket-pruned scan, batch side broadcast), then the
    // live merge root of that label. Fresh endpoints resolve to themselves
    // — their labels rows are being written this very batch.
    val stale = pairs.filter(col("a") < lit(freshFrom))
      .select(col("a").as("doc_id")).distinct()
    val touched = stale
      .select(pmod(col("doc_id"), lit(LabelBuckets.toLong)).cast("int").as("bucket"))
      .distinct().collect().map(_.getInt(0)).toSeq // <= LabelBuckets rows
    val roots = liveRoots(spark, dir, Some(batchId))
    val staleResolved = if (touched.isEmpty) {
      stale.select(col("doc_id"), col("doc_id").as("r")) // empty frame, schema only
    } else {
      val lbls = spark.read.parquet(s"$dir/labels")
        .filter(col("batch_id") =!= lit(batchId))
        .filter(col("bucket").isin(touched: _*))
        .select(col("doc_id"), col("lbl"))
      lbls.join(broadcast(stale), Seq("doc_id"))
        .join(roots.withColumnRenamed("v", "lbl"), Seq("lbl"), "left")
        .select(col("doc_id"), coalesce(col("root"), col("lbl")).as("r"))
    }
    val edges = pairs
      .join(staleResolved.withColumnRenamed("doc_id", "a"), Seq("a"), "left")
      .select(coalesce(col("r"), col("a")).as("ra"), col("b").as("rb"))
      .select(least(col("ra"), col("rb")).as("u"), greatest(col("ra"), col("rb")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    edges.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$dir/merges")
  }

  /** Current keeper assignment over every registered doc — same output
    * contract as [[Dedup.keepersFromPairs]]: (doc_id, keeper, is_keeper,
    * n_members), keeper = min doc_id of the doc's near-dup component,
    * singletons keep themselves. */
  def assignments(spark: SparkSession, dir: String): DataFrame = {
    recover(spark, dir) // finish a crash-interrupted compaction's deletes
    val labels = spark.read.parquet(s"$dir/labels").select("doc_id", "lbl")
    val roots = liveRoots(spark, dir, None)
    val assigned = labels
      .join(roots.withColumnRenamed("v", "lbl"), Seq("lbl"), "left")
      .select(col("doc_id"), coalesce(col("root"), col("lbl")).as("keeper"))
      // self-healing read (SignatureStore convention): in the crash window
      // between a compaction's fold commit and its manifest write a doc has
      // two labels rows; both resolve to the same keeper (the folded edges
      // are still live in that window), so min-collapse is a no-op outside
      // the window and removes the duplicate inside it
      .groupBy("doc_id").agg(min("keeper").as("keeper"))
    val sizes = assigned.groupBy("keeper").agg(count(lit(1)).as("n_members"))
    assigned.join(sizes, "keeper")
      .select(col("doc_id"), col("keeper"),
        (col("doc_id") === col("keeper")).as("is_keeper"), col("n_members"))
      .orderBy("doc_id")
  }

  /** Fold batches 0..upTo: bake each ≤upTo doc's resolved keeper into its
    * labels row (consolidated batch_id = -1, bucket layout kept), rewrite
    * every LATER batch's merge edges through the contraction map of the
    * deleted edges, then delete the folded merge partitions. The
    * contraction map uses ONLY the merges being deleted — newer edges and
    * newer labels keep their linkage through the rewrite (a newer edge's
    * fresh side is always its own batch's doc, so contraction can never
    * collapse a newer edge to a self-loop). Rewriting a later partition is
    * exactly what that batch's replay would write post-compaction, so the
    * replay contract is preserved. Crash windows mirror SignatureStore:
    * duplicate labels rows heal via dropDuplicates on the next compact and
    * are harmless in between only if the fold committed — so deletes are
    * manifest-guarded and finished by [[recover]]. `upTo` must only cover
    * committed batches (StreamDedup passes batchId - 1). */
  def compact(spark: SparkSession, dir: String, upTo: Long): Unit = {
    require(upTo >= 0, s"compact upTo must be >= 0, got $upTo")
    recover(spark, dir)
    val mPath = s"$dir/merges"
    val lPath = s"$dir/labels"
    val hasMerges = hasBatchPartitions(mPath)
    val contraction = if (!hasMerges) liveRoots(spark, dir, None) else {
      val m = spark.read.parquet(mPath)
      Dedup.components(m.filter(col("batch_id") <= lit(upTo))
          .select(col("u").as("a"), col("v").as("b")))
        .select(col("v"), col("lbl").as("root"))
    }
    // bake labels <= upTo (includes a prior batch_id=-1 fold)
    val baked = spark.read.parquet(lPath)
      .filter(col("batch_id") <= lit(upTo))
      // heals a half-finished earlier compaction: of a duplicate's two rows
      // (raw own-id + previously-baked root), only the MIN lbl's linkage
      // survived that compaction's edge deletion — arbitrary-pick dedup
      // could resurrect the own-id row and orphan the doc
      .groupBy("doc_id").agg(min("lbl").as("lbl"))
      .join(contraction.withColumnRenamed("v", "lbl"), Seq("lbl"), "left")
      .select(col("doc_id"), coalesce(col("root"), col("lbl")).as("lbl"),
        pmod(col("doc_id"), lit(LabelBuckets.toLong)).cast("int").as("bucket"))
      .withColumn("batch_id", lit(CompactedBatchId))
    baked.repartition(col("bucket"))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "bucket").parquet(lPath)
    // contract newer edges through the deleted subgraph
    if (hasMerges) {
      val newer = spark.read.parquet(mPath).filter(col("batch_id") > lit(upTo))
      if (!newer.isEmpty) {
        newer
          .join(contraction.select(col("v").as("u"), col("root").as("ru")), Seq("u"), "left")
          .join(contraction.select(col("v"), col("root").as("rv")), Seq("v"), "left")
          .select(coalesce(col("ru"), col("u")).as("cu"),
            coalesce(col("rv"), col("v")).as("cv"), col("batch_id"))
          .select(least(col("cu"), col("cv")).as("u"),
            greatest(col("cu"), col("cv")).as("v"), col("batch_id"))
          .filter(col("u") =!= col("v")).distinct()
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(mPath)
      }
    }
    // manifest-guarded deletion of the folded partitions
    val doomed = scala.collection.mutable.ArrayBuffer.empty[String]
    def collectDoomed(path: String): Unit = {
      val dirFile = new java.io.File(path)
      Option(dirFile.listFiles()).getOrElse(Array.empty).foreach { f =>
        val n = f.getName
        if (n.startsWith("batch_id=") && !n.endsWith(s"=$CompactedBatchId")) {
          val id = n.stripPrefix("batch_id=").toLong
          if (id >= 0 && id <= upTo) doomed += f.getAbsolutePath
        }
      }
    }
    collectDoomed(lPath)
    if (hasMerges) collectDoomed(mPath)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(manifestPath(dir)),
      doomed.map(p => "\"" + p + "\"").mkString("[", ",", "]"))
    deleteDoomed(dir)
  }

  /** Finish a crash-interrupted compaction's deletes (rows already live in
    * the consolidated partitions). */
  def recover(spark: SparkSession, dir: String): Unit =
    if (new java.io.File(manifestPath(dir)).exists()) deleteDoomed(dir)

  private def deleteDoomed(dir: String): Unit = {
    val mp = java.nio.file.Paths.get(manifestPath(dir))
    val listed = java.nio.file.Files.readString(mp)
      .split(',').map(_.trim.stripPrefix("[").stripSuffix("]").trim)
      .filter(_.nonEmpty).map(_.stripPrefix("\"").stripSuffix("\""))
    listed.foreach(p => graft.FsUtil.deleteRecursively(new java.io.File(p)))
    java.nio.file.Files.deleteIfExists(mp)
  }
}
