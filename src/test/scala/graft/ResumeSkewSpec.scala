package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.build.{IndexBuilder, IndexConfig}
import graft.gen.TranscriptGen
import graft.query.{QueryEngine, SearchQuery, Bm25Oracle}
import graft.build.DocIds
import graft.model.DocTurn

/** Resumability (north rule: per-partition checkpoints, identical rerun) and
  * skew behavior (chunked heavy terms; optional reference-style cap). */
class ResumeSkewSpec extends SparkFunSuite {
  import spark.implicits._

  private def postingsContent(dir: String): Seq[(String, String, Long, Seq[Byte])] =
    spark.read.parquet(s"$dir/postings")
      .select("field", "term", "chunk", "blob")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getAs[Array[Byte]](3).toSeq))
      .toSeq.sortBy(t => (t._1, t._2, t._3))

  test("resume: deleting group manifests and rerunning reproduces identical index") {
    val dir = SparkSpec.tmpDir("graft-resume")
    val turns = TranscriptGen.turns(spark, 2000, 4).toDF()
    val cfg = IndexConfig(buckets = 8, chunkDocs = 512, bucketGroups = 4)

    IndexBuilder.build(spark, turns, dir, cfg)
    val full = postingsContent(dir)
    assert(full.nonEmpty)

    // simulate a crash after groups 0-1: groups 2-3 lose their checkpoints
    Files.delete(Paths.get(s"$dir/_manifest/group-2.json"))
    Files.delete(Paths.get(s"$dir/_manifest/group-3.json"))
    val m0 = Files.getLastModifiedTime(Paths.get(s"$dir/_manifest/group-0.json"))

    IndexBuilder.build(spark, turns, dir, cfg)
    // completed groups were skipped (checkpoint respected)...
    assert(Files.getLastModifiedTime(Paths.get(s"$dir/_manifest/group-0.json")) == m0)
    // ...and the re-built groups reproduce identical content
    assert(postingsContent(dir) == full)
  }

  test("skew: heavy term is chunked, every chunk bounded, results exact") {
    val dir = SparkSpec.tmpDir("graft-skew")
    val n = 3000L
    val chunkDocs = 256L
    IndexBuilder.build(spark, TranscriptGen.turns(spark, n, 4).toDF(), dir,
      IndexConfig(buckets = 8, chunkDocs = chunkDocs))
    // 'the' is a stopword-grade term: present in a large share of turns
    val rows = spark.read.parquet(s"$dir/postings")
      .filter(col("field") === "text" && col("term") === "the")
      .select("chunk", "dfChunk").collect()
    assert(rows.length > 5, s"expected many chunks, got ${rows.length}")
    assert(rows.forall(_.getLong(1) <= chunkDocs))
    // and the query over the chunked postings is still exact vs the oracle
    val docs = DocIds.assign(TranscriptGen.turns(spark, n, 4).toDF())
      .select("docId", "conv_id", "turn_idx", "role", "text", "tool", "ts")
      .as[DocTurn].collect().toSeq.sortBy(_.docId)
    val oracle = Bm25Oracle.buildIndex(docs)
    val q = SearchQuery.of(Seq("text" -> Seq("the")), 50)
    val engine = new QueryEngine(spark, dir)
    val got = engine.topK(q).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exp = Bm25Oracle.topK(oracle, q)
    assert(got == exp)
  }

  test("determinism: builds at different parallelism produce identical index content") {
    val turns = TranscriptGen.turns(spark, 1500, 4).toDF()
    val cfg = IndexConfig(buckets = 8, chunkDocs = 256)
    val d2 = SparkSpec.tmpDir("graft-det2")
    val d7 = SparkSpec.tmpDir("graft-det7")
    IndexBuilder.build(spark, turns, d2, cfg.copy(docIdPartitions = 2))
    IndexBuilder.build(spark, turns, d7, cfg.copy(docIdPartitions = 7))
    assert(postingsContent(d2) == postingsContent(d7))
    def normsContent(dir: String) = spark.read.parquet(s"$dir/norms")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getAs[Array[Byte]](2).toSeq))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(normsContent(d2) == normsContent(d7))
  }

  test("cap: maxDocsPerTerm truncates to the first N docIds (reference isInvalidData)") {
    val dir = SparkSpec.tmpDir("graft-cap")
    IndexBuilder.build(spark, TranscriptGen.turns(spark, 2000, 4).toDF(), dir,
      IndexConfig(buckets = 4, chunkDocs = 128, maxDocsPerTerm = 100))
    val rows = spark.read.parquet(s"$dir/postings")
      .filter(col("field") === "text" && col("term") === "the")
      .orderBy("chunk")
      .select("chunk", "blob").collect()
    val decoded = rows.flatMap(r => graft.codec.PostingCodec.decode(r.getAs[Array[Byte]](1)))
    assert(decoded.length == 100, s"got ${decoded.length}")
    // kept postings are the FIRST 100 docIds (ascending, contiguous prefix)
    assert(decoded.map(_.docId).toSeq == decoded.map(_.docId).toSeq.sorted)
    // header stats stay full-corpus (reference keeps full pv in the header)
    val df = spark.read.parquet(s"$dir/termstats")
      .filter(col("field") === "text" && col("term") === "the")
      .select("df").collect()(0).getLong(0)
    assert(df > 100)
  }
}
