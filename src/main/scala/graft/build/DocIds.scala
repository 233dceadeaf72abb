package graft.build

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Stable, deterministic docId assignment: docId = rank of (conv_id, turn_idx)
  * in global table sort order, 0-based.
  *
  * Rebuild of the reference's begin-docid mechanism: Poseidon distributes a
  * `fname_begin_docid.txt` side file of per-input-file starting ids and each
  * mapper computes `docid = begin_docid + line_no/128`
  * (builder/index/.../InvertedIndexGenerateMapper.java:74-119,172-173,
  * InvertedIndexGenerate.java:88-93); the Redis INCRBY idgenerator
  * (service/idgenerator/module/idgenerator.go:80-87) becomes unnecessary —
  * the id is a pure function of the data (SURVEY.md §1.3).
  *
  * Scalable two-pass shape (no global window, no monotonically_increasing_id):
  *   1. range-partition + sort by (conv_id, turn_idx);
  *   2. count rows per partition (small collect), prefix-sum to per-partition
  *      base offsets;
  *   3. docId = base(partition) + (row_number within partition) - 1.
  * The result is invariant under parallelism because the id equals the global
  * rank regardless of where range boundaries fall (asserted by DocIdSpec at
  * local[2] vs local[8]).
  */
object DocIds {

  /** @param df transcript table with at least (conv_id, turn_idx); keys must
    *           be unique per row (stable turn ordering invariant).
    * @param numPartitions target range partitions (cluster-sized in prod).
    */
  def assign(df: DataFrame, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(p, col("conv_id"), col("turn_idx"))
      .sortWithinPartitions("conv_id", "turn_idx")
      .withColumn("_pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)

    // pass 1: per-partition counts → base offsets (driver-side: P rows only)
    import spark.implicits._
    val counts = sorted.groupBy("_pid").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val bases = counts.map { case (pid, c) => val b = acc; acc += c; (pid, b) }
    val baseDf = bases.toSeq.toDF("_pid", "_base")

    // pass 2: base (broadcast-joined — stays a tiny P-row dim at any scale)
    // + local rank. The window partitions by _pid — each window partition is
    // one data partition, so per-task state stays bounded.
    val w = Window.partitionBy("_pid").orderBy("conv_id", "turn_idx")
    sorted
      .join(broadcast(baseDf), Seq("_pid"))
      .withColumn("docId", col("_base") + row_number().over(w) - 1)
      .drop("_pid", "_base")
  }
}
