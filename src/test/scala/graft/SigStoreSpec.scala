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

  test("compaction folds committed batches into one partition; pairs unchanged") {
    val dir = SparkSpec.tmpDir("graft-sigstore-compact")
    val maxId = docs.agg(max("doc_id")).collect()(0).getLong(0)
    val c1 = maxId / 3; val c2 = 2 * maxId / 3
    SignatureStore.append(spark, docs.filter(col("doc_id") < c1), dir, 0L)
    SignatureStore.append(spark,
      docs.filter(col("doc_id") >= c1 && col("doc_id") < c2), dir, 1L)
    SignatureStore.append(spark, docs.filter(col("doc_id") >= c2), dir, 2L)
    def sig(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSeq
    val before = sig(SignatureStore.pairsTouchingFresh(spark, dir, c2, 0.95))
    val nSigs = spark.read.parquet(s"$dir/signatures").count()

    SignatureStore.compact(spark, dir, upTo = 1L)
    def batchDirs(sub: String) =
      new java.io.File(s"$dir/$sub").listFiles().map(_.getName)
        .filter(_.startsWith("batch_id=")).sorted.toSeq
    // batches 0 and 1 folded into -1; the uncommitted batch 2 untouched
    Seq("signatures", "tokensets", "bands").foreach { sub =>
      assert(batchDirs(sub) == Seq("batch_id=-1", "batch_id=2"), s"$sub: ${batchDirs(sub)}")
    }
    assert(spark.read.parquet(s"$dir/signatures").count() == nSigs)
    assert(sig(SignatureStore.pairsTouchingFresh(spark, dir, c2, 0.95)) == before)
    // re-compacting (now covering batch 2 as committed) is idempotent-safe
    SignatureStore.compact(spark, dir, upTo = 2L)
    Seq("signatures", "tokensets", "bands").foreach { sub =>
      assert(batchDirs(sub) == Seq("batch_id=-1"))
    }
    assert(sig(SignatureStore.pairsTouchingFresh(spark, dir, c2, 0.95)) == before)
    assert(sig(SignatureStore.pairsTouchingFresh(spark, dir, 0L, 0.95)) ==
           sig(Dedup.minhashLsh(docs, 0.95)))

    // crash-mid-deletion recovery: a manifest listing a doomed dir is
    // finished by recover() (called from the read path)
    val bogus = new java.io.File(s"$dir/signatures/batch_id=99")
    bogus.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/_compact_manifest.json"),
      "[\"" + bogus.getAbsolutePath + "\"]")
    SignatureStore.recover(spark, dir)
    assert(!bogus.exists())
    assert(!new java.io.File(s"$dir/_compact_manifest.json").exists())
  }
}
