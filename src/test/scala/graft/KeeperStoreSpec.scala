package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, KeeperStore}

/** Continuous keeper assignment: store-maintained labels + contracted merge
  * edges must equal the one-call batch operator after every batch, through
  * replays and compactions. */
class KeeperStoreSpec extends SparkFunSuite {
  import spark.implicits._

  private def asg(df: DataFrame) = df.collect().map(_.toSeq).toSeq

  private def expect(docIds: Seq[Long], pairs: Seq[(Long, Long)]) =
    asg(Dedup.keepersFromPairs(docIds.toDF("doc_id"),
      pairs.toDF("a", "b")))

  test("per-batch updates == batch keepersFromPairs, incl. cross-batch chains and bridges") {
    val dir = SparkSpec.tmpDir("graft-keeperstore")
    // batch 0: docs 0-9; components {1,5}, {2,7}
    val d0 = (0L to 9L); val p0 = Seq((1L, 5L), (2L, 7L))
    KeeperStore.update(spark, dir, d0.toDF("doc_id"), p0.toDF("a", "b"), 0L, 0L)
    assert(asg(KeeperStore.assignments(spark, dir)) == expect(d0, p0))

    // batch 1: docs 10-19; chain extension (5,12) grows {1,5}; fresh
    // bridge 15 MERGES {1,5,12} with {2,7} via (1,15) + (7,15); in-batch
    // chain (16,17),(17,18)
    val d1 = (10L to 19L)
    val p1 = Seq((5L, 12L), (1L, 15L), (7L, 15L), (16L, 17L), (17L, 18L))
    KeeperStore.update(spark, dir, d1.toDF("doc_id"), p1.toDF("a", "b"), 1L, 10L)
    val all1 = expect(d0 ++ d1, p0 ++ p1)
    assert(asg(KeeperStore.assignments(spark, dir)) == all1)
    // the merged mega-component keeps min id 1 with 6 members
    assert(all1.count(r => r(1) == 1L) == 6)

    // replay of batch 1 (StreamDedup's crash contract): nothing changes
    KeeperStore.update(spark, dir, d1.toDF("doc_id"), p1.toDF("a", "b"), 1L, 10L)
    assert(asg(KeeperStore.assignments(spark, dir)) == all1)
    val mergeRows = spark.read.parquet(s"$dir/merges").count()
    KeeperStore.update(spark, dir, d1.toDF("doc_id"), p1.toDF("a", "b"), 1L, 10L)
    assert(spark.read.parquet(s"$dir/merges").count() == mergeRows)

    // compact batches 0-1, then batch 2 must still resolve through the
    // baked labels: (12,25) touches the mega-component via a doc whose own
    // linkage (5,12) was folded away
    KeeperStore.compact(spark, dir, upTo = 1L)
    def batchDirs(sub: String) =
      new java.io.File(s"$dir/$sub").listFiles().map(_.getName)
        .filter(_.startsWith("batch_id=")).sorted.toSeq
    assert(batchDirs("labels") == Seq("batch_id=-1"))
    assert(batchDirs("merges").isEmpty || batchDirs("merges") == Seq())
    assert(asg(KeeperStore.assignments(spark, dir)) == all1)

    val d2 = (20L to 29L); val p2 = Seq((12L, 25L), (20L, 21L))
    KeeperStore.update(spark, dir, d2.toDF("doc_id"), p2.toDF("a", "b"), 2L, 20L)
    val all2 = expect(d0 ++ d1 ++ d2, p0 ++ p1 ++ p2)
    assert(asg(KeeperStore.assignments(spark, dir)) == all2)
    // 25 joined the keeper-1 component through the bake
    assert(all2.count(r => r(1) == 1L) == 7)

    // compact again with a NEWER batch outstanding: batch 3 written, then
    // compact(upTo=2) must contract batch 3's edges through the deleted
    // subgraph without breaking them
    val d3 = (30L to 39L); val p3 = Seq((25L, 31L), (21L, 32L))
    KeeperStore.update(spark, dir, d3.toDF("doc_id"), p3.toDF("a", "b"), 3L, 30L)
    val all3 = expect(d0 ++ d1 ++ d2 ++ d3, p0 ++ p1 ++ p2 ++ p3)
    assert(asg(KeeperStore.assignments(spark, dir)) == all3)
    KeeperStore.compact(spark, dir, upTo = 2L)
    assert(batchDirs("labels") == Seq("batch_id=-1", "batch_id=3"))
    assert(batchDirs("merges") == Seq("batch_id=3"))
    assert(asg(KeeperStore.assignments(spark, dir)) == all3)
    // contracted batch-3 edges now reference baked keepers, not dead labels
    val e3 = spark.read.parquet(s"$dir/merges")
      .select("u", "v").as[(Long, Long)].collect().toSet
    assert(e3 == Set((1L, 31L), (20L, 32L)))

    // crash-mid-deletion recovery (manifest pattern)
    val bogus = new java.io.File(s"$dir/merges/batch_id=99")
    bogus.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/_compact_manifest.json"),
      "[\"" + bogus.getAbsolutePath + "\"]")
    KeeperStore.recover(spark, dir)
    assert(!bogus.exists())
    assert(!new java.io.File(s"$dir/_compact_manifest.json").exists())
  }

  test("end-to-end through StreamDedup.processBatch == Dedup.keepers over the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").cache()
    val maxId = docs.agg(max("doc_id")).collect()(0).getLong(0)
    val c1 = maxId / 3; val c2 = 2 * maxId / 3
    val base = SparkSpec.tmpDir("graft-keeperstore-e2e")
    val kd = Some(s"$base/keepers")
    graft.streaming.StreamDedup.processBatch(spark,
      docs.filter(col("doc_id") < c1), 0L, s"$base/corpus", s"$base/pairs",
      0.95, keepersDir = kd)
    graft.streaming.StreamDedup.processBatch(spark,
      docs.filter(col("doc_id") >= c1 && col("doc_id") < c2), 1L,
      s"$base/corpus", s"$base/pairs", 0.95, keepersDir = kd)
    // compact both stores mid-stream, then the last batch
    graft.ops.SignatureStore.compact(spark, s"$base/corpus-sigstore", 1L)
    KeeperStore.compact(spark, kd.get, 1L)
    graft.streaming.StreamDedup.processBatch(spark,
      docs.filter(col("doc_id") >= c2), 2L, s"$base/corpus", s"$base/pairs",
      0.95, keepersDir = kd)
    assert(asg(KeeperStore.assignments(spark, kd.get)) ==
           asg(Dedup.keepers(docs, 0.95)))
  }
}
