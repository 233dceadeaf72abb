package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, SignatureStore}

/** Persisted-signature incremental dedup: store path == in-memory operator,
  * batched appends, replay idempotence. */
class SigStoreSpec extends SparkFunSuite {
  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text").cache()

  test("store-backed pairs == minhashLshIncremental on the same corpus") {
    val dir = SparkSpec.tmpDir("graft-sigstore")
    val maxId = docs.agg(max("doc_id")).collect()(0).getLong(0)
    val cut = maxId / 2
    // two batches: the historical corpus, then the fresh suffix
    SignatureStore.append(spark, docs.filter(col("doc_id") < cut), dir, 0L)
    SignatureStore.append(spark, docs.filter(col("doc_id") >= cut), dir, 1L)
    def sig(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSeq
    assert(sig(SignatureStore.pairsTouchingFresh(spark, dir, cut, 0.95)) ==
           sig(Dedup.minhashLshIncremental(docs, cut, 0.95)))
    // full-history check from the same store (freshFrom = 0): equals the
    // batch operator over everything
    assert(sig(SignatureStore.pairsTouchingFresh(spark, dir, 0L, 0.95)) ==
           sig(Dedup.minhashLsh(docs, 0.95)))
  }

  test("replayed append rewrites its batch partition (no duplicate signatures)") {
    val dir = SparkSpec.tmpDir("graft-sigstore-replay")
    val batch = docs.limit(50)
    SignatureStore.append(spark, batch, dir, 0L)
    val n1 = spark.read.parquet(s"$dir/signatures").count()
    SignatureStore.append(spark, batch, dir, 0L) // crash-replay of batch 0
    assert(spark.read.parquet(s"$dir/signatures").count() == n1)
    assert(spark.read.parquet(s"$dir/tokensets").count() == n1)
    // token-less docs never enter the store (outside the similarity domain)
    SignatureStore.append(spark,
      Seq((100000L, "!!! ???"), (100001L, "alpha beta gamma")).toDF("doc_id", "text"),
      dir, 1L)
    val added = spark.read.parquet(s"$dir/signatures")
      .filter(col("doc_id") >= 100000L).collect()
    assert(added.map(_.getLong(0)).toSeq == Seq(100001L))
  }
}
