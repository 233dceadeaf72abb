package graft.build

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (docId, tf, dl) occurrence row feeding the posting aggregation. */
final case class OccRow(docId: Long, tf: Int, dl: Int)

/** Final per-group postings: parallel arrays sorted by docId ascending. */
final case class PostingsOut(docIds: Array[Long], tfs: Array[Int], dls: Array[Int])

/** Aggregation buffer: a list of docId-sorted runs (each an interleaved
  * Array[Long] of (docId, tf, dl) triplets) plus an unsorted tail that new
  * rows append to. Sealing the tail sorts it into a run; `merge` concatenates
  * run lists; `finish` k-way sort-merges all runs.
  */
final class PostingBuf(
    var runs: ArrayBuffer[Array[Long]],
    var tail: ArrayBuffer[Long]) extends Serializable {
  def this() = this(ArrayBuffer.empty, ArrayBuffer.empty)

  def sealTail(): Unit = {
    if (tail.nonEmpty) {
      runs += PostingAgg.sortTriplets(tail.toArray)
      tail = ArrayBuffer.empty
    }
  }
}

/** Typed posting-list aggregator — the rebuild of the reference's
  * combiner/reducer pair (InvertedIndexGenerateCombiner.java:41-109 merges
  * partial delta lists map-side; InvertedIndexGenerateReducer.java:85-252 +
  * ReduceGroupData.java:29-157 does the final merge+sort; SURVEY.md §2.4
  * A2/A3). Spark's partial/final hash aggregation invokes `reduce` map-side
  * and `merge` reduce-side automatically, so per-partition sorted runs are
  * built locally and combined via sort-merge — no hand-rolled spill files
  * (the reference's 16 MB side-file spill, Reducer.java:104-178, is replaced
  * by Spark's ObjectHashAggregate spill).
  *
  * Duplicate docIds cannot occur per group (tf is pre-counted per doc), so a
  * group of G docs costs O(G log R) merge work for R runs.
  */
object PostingAgg extends Aggregator[OccRow, PostingBuf, PostingsOut] {

  override def zero: PostingBuf = new PostingBuf()

  override def reduce(b: PostingBuf, a: OccRow): PostingBuf = {
    b.tail += a.docId += a.tf.toLong += a.dl.toLong
    b
  }

  override def merge(b1: PostingBuf, b2: PostingBuf): PostingBuf = {
    b1.sealTail(); b2.sealTail()
    // keep run count bounded: pairwise sort-merge when the list grows
    b1.runs ++= b2.runs
    while (b1.runs.length > 16) {
      val r2 = b1.runs.remove(b1.runs.length - 1)
      val r1 = b1.runs.remove(b1.runs.length - 1)
      b1.runs += mergeRuns(r1, r2)
    }
    b1
  }

  override def finish(b: PostingBuf): PostingsOut = {
    b.sealTail()
    var merged: Array[Long] = if (b.runs.isEmpty) Array.emptyLongArray else b.runs.head
    var i = 1
    while (i < b.runs.length) { merged = mergeRuns(merged, b.runs(i)); i += 1 }
    val n = merged.length / 3
    val docIds = new Array[Long](n); val tfs = new Array[Int](n); val dls = new Array[Int](n)
    var j = 0
    while (j < n) {
      docIds(j) = merged(3 * j); tfs(j) = merged(3 * j + 1).toInt; dls(j) = merged(3 * j + 2).toInt
      j += 1
    }
    PostingsOut(docIds, tfs, dls)
  }

  override def bufferEncoder: Encoder[PostingBuf] = Encoders.kryo[PostingBuf]
  override def outputEncoder: Encoder[PostingsOut] = Encoders.product[PostingsOut]

  /** Sort interleaved (docId, tf, dl) triplets by docId ascending. */
  def sortTriplets(a: Array[Long]): Array[Long] = {
    val n = a.length / 3
    val idx = Array.range(0, n)
    // sort indices by docId (stable; docIds unique per group in practice)
    val sorted = idx.sortBy(i => a(3 * i))
    val out = new Array[Long](a.length)
    var j = 0
    while (j < n) {
      val i = sorted(j)
      out(3 * j) = a(3 * i); out(3 * j + 1) = a(3 * i + 1); out(3 * j + 2) = a(3 * i + 2)
      j += 1
    }
    out
  }

  /** Sort-merge two docId-sorted triplet runs. */
  def mergeRuns(x: Array[Long], y: Array[Long]): Array[Long] = {
    val out = new Array[Long](x.length + y.length)
    var i = 0; var j = 0; var k = 0
    while (i < x.length && j < y.length) {
      if (x(i) <= y(j)) { out(k) = x(i); out(k + 1) = x(i + 1); out(k + 2) = x(i + 2); i += 3 }
      else { out(k) = y(j); out(k + 1) = y(j + 1); out(k + 2) = y(j + 2); j += 3 }
      k += 3
    }
    while (i < x.length) { out(k) = x(i); k += 1; i += 1 }
    while (j < y.length) { out(k) = y(j); k += 1; j += 1 }
    out
  }
}
