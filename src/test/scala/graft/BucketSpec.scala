package graft

import org.apache.spark.sql.functions._
import graft.build.IndexBuilder

/** The driver-side bucket hash and the codegen'd Column form must agree on
  * every term (query-side partition pruning depends on it). */
class BucketSpec extends SparkFunSuite {
  import spark.implicits._

  test("bucketOf (driver murmur3) == pmod(hash(term), buckets) (Column) on edge + random terms") {
    val rnd = new scala.util.Random(7)
    val terms = Seq("", "a", "ab", "the", "error", "needle-000001", "0", "zz9",
      "tool-grep", "éüñ", "中文", "😀emoji",
      "x" * 40, "x" * 41) ++
      (1 to 500).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(20)).mkString)
    for (buckets <- Seq(1, 16, 32, 1000)) {
      val viaCol = terms.toDF("t")
        .select(col("t"), IndexBuilder.bucketCol(col("t"), buckets).as("b"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      terms.foreach { t =>
        assert(IndexBuilder.bucketOf(t, buckets) == viaCol(t),
          s"term=<$t> buckets=$buckets")
      }
    }
  }
}
