package graft.build

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
  * Scalable two-pass shape (no global window, no monotonically_increasing_id):
  *   1. range-partition + sort by (conv_id, turn_idx), persist (the persist
  *      is LOAD-BEARING: re-executing repartitionByRange reseeds its range
  *      sampling per RDD instance, so unpinned passes could disagree on
  *      partition boundaries);
  *   2. per partition, emit (first sort key, row count) — a P-row collect —
  *      and prefix-sum to base offsets KEYED BY THE FIRST SORT KEY. Keying
  *      by data instead of partition id matters: TaskContext partition ids
  *      shift when the plan is consumed inside a union (branch i's tasks see
  *      ids offset by i*P), which would silently mis-base every id;
  *   3. one streamed per-partition pass assigns base + local index, looking
  *      up the base by the partition's own first row. An unknown first key
  *      fails loudly rather than corrupting ids.
  * The result is invariant under parallelism because the id equals the global
  * rank regardless of where range boundaries fall (DocIdSpec asserts at two
  * partition counts), and the output stays range-partitioned/sorted by docId
  * so downstream writes need no re-sort.
  */
object DocIds {

  def assign(df: DataFrame, numPartitions: Int = 0): DataFrame =
    assignWithHandle(df, numPartitions)._1

  /** Like assign, also returning the pinned intermediate (for unpersisting)
    * and the total row count. The count falls out of pass 1's per-partition
    * tallies for free — callers must NOT run a separate `.count()` over the
    * result (it re-walks the whole pinned sort; it was a measured serial
    * second on the 1-core scaling leg). */
  def assignWithHandle(df: DataFrame, numPartitions: Int = 0): (DataFrame, DataFrame, Long) = {
    val spark = df.sparkSession
    val p = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(p, col("conv_id"), col("turn_idx"))
      .sortWithinPartitions("conv_id", "turn_idx")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val convIdx = sorted.schema.fieldIndex("conv_id")
    val turnIdx = sorted.schema.fieldIndex("turn_idx")

    // pass 1: (first key, count) per partition — P rows to the driver
    val partInfo = sorted.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val first = it.next()
        val k1 = first.getString(convIdx)
        val k2 = first.getInt(turnIdx)
        var n = 1L
        while (it.hasNext) { it.next(); n += 1 }
        Iterator.single((k1, k2, n))
      }
    }(Encoders.tuple(Encoders.STRING, Encoders.scalaInt, Encoders.scalaLong))
      .collect()
      // sort first keys in UTF-8 BYTE order (UTF8String), matching
      // repartitionByRange's partitioner ordering — Java String ordering
      // diverges for supplementary (non-BMP) characters and would silently
      // mis-base docIds for such conv_ids
      .sortWith { (x, y) =>
        val c = org.apache.spark.unsafe.types.UTF8String.fromString(x._1)
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(y._1))
        c < 0 || (c == 0 && x._2 < y._2)
      }

    var acc = 0L
    val bases: Map[(String, Int), Long] = partInfo.map { case (k1, k2, n) =>
      val b = acc; acc += n; (k1, k2) -> b
    }.toMap
    val basesB = spark.sparkContext.broadcast(bases)

    // pass 2: streamed per-partition rank assignment, base keyed by data
    val outSchema = StructType(sorted.schema.fields :+ StructField("docId", LongType, nullable = false))
    implicit val enc = Encoders.row(outSchema)
    val out = sorted.mapPartitions { it =>
      val buf = it.buffered
      if (!buf.hasNext) Iterator.empty
      else {
        val head = buf.head
        val key = (head.getString(convIdx), head.getInt(turnIdx))
        val base = basesB.value.getOrElse(key,
          throw new IllegalStateException(s"docId base missing for partition first key $key"))
        var i = 0L
        buf.map { row =>
          val vals = new Array[Any](row.length + 1)
          var j = 0
          while (j < row.length) { vals(j) = row.get(j); j += 1 }
          vals(row.length) = base + i
          i += 1
          new GenericRowWithSchema(vals, outSchema): Row
        }
      }
    }
    (out, sorted, acc)
  }
}
