package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Random-hyperplane sign matrix shared by the LSH bucketing operators.
  *
  * Sign s(j, d) = +1 if the first hex nibble of md5("hp-j-d") is even else
  * -1 — deterministic and data-independent, so index and query agree with no
  * stored model, and the exact same value is computable in DuckDB SQL (the
  * oracle keeps using the md5 form).
  *
  * The matrix is (bits x dim) CONSTANT data: it is computed once here
  * (driver, 8 x dim md5 calls) and injected as a folded literal — round 1
  * evaluated the md5 inside a per-row lambda, ~8 x dim digests PER ROW for
  * identical values.
  */
object Hyperplanes {

  private val cache = scala.collection.concurrent.TrieMap[(Int, Int), Array[Array[Double]]]()

  /** signs(bits, dim)(j)(d) = ±1.0 */
  def signs(bits: Int, dim: Int): Array[Array[Double]] =
    cache.getOrElseUpdate((bits, dim), Array.tabulate(bits, dim) { (j, d) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"hp-$j-$d".getBytes("UTF-8"))
      val nibble = (md(0) >> 4) & 0xf
      if (nibble % 2 == 0) 1.0 else -1.0
    })

  /** dot(v, h_j) as a Column over an array<float> embedding column — the
    * signs ride in as a constant-folded literal array; summation order (dim
    * ascending, 0.0 init) is unchanged from the md5-per-row form, so values
    * are bit-identical to round 1 and to the SQL oracle. */
  def dotCol(emb: Column, bits: Int, dim: Int, j: Int): Column = {
    val s = signs(bits, dim)(j)
    val signArr = array(s.map(lit): _*)
    aggregate(
      zip_with(emb, signArr, (v, sg) => v.cast("double") * sg),
      lit(0.0),
      (acc, v) => acc + v)
  }

  /** Signature bucket (bits-wide int) of an embedding column. */
  def bucketCol(emb: Column, bits: Int, dim: Int): Column =
    (0 until bits).map { j =>
      when(dotCol(emb, bits, dim, j) > 0, 1 << j).otherwise(0)
    }.reduce(_ + _)

  /** Signature bucket as a compiled UDF — the per-row twin of [[bucketCol]]
    * for hot paths: Spark evaluates the aggregate/zip_with lambdas in
    * [[bucketCol]] INTERPRETED per element, so the declarative form pays an
    * interpreter loop over bits × dim for every row. Fold order and FP shape
    * are identical (dim-ascending double sum, 0.0 init, strict > 0), so the
    * bucket values are bit-identical — [[bucketCol]] stays as the
    * documentation/oracle-mirror form and for spec cross-checks. */
  def bucketUdf(bits: Int, dim: Int): org.apache.spark.sql.expressions.UserDefinedFunction = {
    val s = signs(bits, dim) // driver-computed constant matrix in the closure
    udf { emb: Seq[Float] =>
      val v = emb.toArray
      var sig = 0
      var j = 0
      while (j < bits) {
        val sj = s(j)
        var dot = 0.0
        var d = 0
        while (d < v.length) { dot += v(d).toDouble * sj(d); d += 1 }
        if (dot > 0) sig |= 1 << j
        j += 1
      }
      sig
    }
  }

  /** Driver-side signature of one vector (same matrix, same fold order). */
  def signatureOf(v: Array[Float], bits: Int): Int = {
    val s = signs(bits, v.length)
    (0 until bits).map { j =>
      var dot = 0.0
      var d = 0
      while (d < v.length) { dot += v(d).toDouble * s(j)(d); d += 1 }
      if (dot > 0) 1 << j else 0
    }.sum
  }
}
