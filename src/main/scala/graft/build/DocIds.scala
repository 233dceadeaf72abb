package graft.build

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
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
  * Scalable two-pass shape (no global window, no monotonically_increasing_id,
  * no extra exchange beyond the one range shuffle):
  *   1. range-partition + sort by (conv_id, turn_idx), persist;
  *   2. count rows per partition (P-row collect), prefix-sum to per-partition
  *      base offsets — the side-file analog, broadcast;
  *   3. one streamed per-partition pass assigns base + local index.
  * The result is invariant under parallelism because the id equals the global
  * rank regardless of where range boundaries fall (DocIdSpec asserts at two
  * partition counts), and the output stays range-partitioned/sorted by docId
  * so downstream writes need no re-sort.
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
      .persist(StorageLevel.MEMORY_AND_DISK)

    // pass 1: per-partition counts -> base offsets (driver sees P rows only)
    val counts = sorted.groupBy(spark_partition_id().as("_pid")).count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val bases = counts.map { case (pid, c) => val b = acc; acc += c; (pid, b) }.toMap
    val basesB = spark.sparkContext.broadcast(bases)

    // pass 2: streamed per-partition rank assignment (no exchange)
    val outSchema = StructType(sorted.schema.fields :+ StructField("docId", LongType, nullable = false))
    implicit val enc = Encoders.row(outSchema)
    sorted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val base = basesB.value.getOrElse(pid, 0L)
      var i = 0L
      it.map { row =>
        val vals = new Array[Any](row.length + 1)
        var j = 0
        while (j < row.length) { vals(j) = row.get(j); j += 1 }
        vals(row.length) = base + i
        i += 1
        new GenericRowWithSchema(vals, outSchema): Row
      }
    }
  }
}
