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
  *
  * Everything is primitive Array[Long] — millions of live buffers sit in the
  * hash-agg map at once, so a boxing collection here turns the build into a
  * GC storm (measured: 2x wall).
  */
final class PostingBuf(
    var runs: ArrayBuffer[Array[Long]],
    var tail: Array[Long],
    var tailLen: Int) extends Serializable {
  def this() = this(ArrayBuffer.empty, null, 0)

  def add3(a: Long, b: Long, c: Long): Unit = {
    if (tail == null) tail = new Array[Long](12)
    else if (tailLen + 3 > tail.length) {
      tail = java.util.Arrays.copyOf(tail, tail.length * 2)
    }
    tail(tailLen) = a; tail(tailLen + 1) = b; tail(tailLen + 2) = c
    tailLen += 3
  }

  def sealTail(): Unit = {
    if (tailLen > 0) {
      runs += PostingAgg.sortTriplets(java.util.Arrays.copyOf(tail, tailLen))
      tail = null
      tailLen = 0
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
    b.add3(a.docId, a.tf.toLong, a.dl.toLong)
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

  /** Sort interleaved (docId, tf, dl) triplets by docId ascending.
    * Boxing-free fast path: pack (docId << 20 | idx) into one long and
    * Arrays.sort it — valid while docId < 2^43 and n < 2^20 (groups are
    * chunk-bounded well below that); falls back to a boxed sort otherwise. */
  def sortTriplets(a: Array[Long]): Array[Long] = {
    val n = a.length / 3
    if (n <= 1) return a
    val out = new Array[Long](a.length)
    var maxDoc = 0L
    var i = 0
    while (i < n) { val d = a(3 * i); if (d > maxDoc) maxDoc = d; i += 1 }
    if (maxDoc < (1L << 43) && n < (1 << 20)) {
      val keys = new Array[Long](n)
      i = 0
      while (i < n) { keys(i) = (a(3 * i) << 20) | i.toLong; i += 1 }
      java.util.Arrays.sort(keys)
      var j = 0
      while (j < n) {
        val src = (keys(j) & 0xfffff).toInt
        out(3 * j) = a(3 * src); out(3 * j + 1) = a(3 * src + 1); out(3 * j + 2) = a(3 * src + 2)
        j += 1
      }
    } else {
      val sorted = Array.range(0, n).sortBy(i2 => a(3 * i2))
      var j = 0
      while (j < n) {
        val src = sorted(j)
        out(3 * j) = a(3 * src); out(3 * j + 1) = a(3 * src + 1); out(3 * j + 2) = a(3 * src + 2)
        j += 1
      }
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
