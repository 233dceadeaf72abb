package graft

import org.apache.spark.sql.Row
import graft.codec.PostingCodec
import graft.functions.VbDecode
import graft.model.Posting

/** Catalyst-expression form of the posting codec. */
class VbDecodeSpec extends SparkFunSuite {
  import spark.implicits._

  test("GraftExtensions injects vb_decode: SQL resolves with NO manual register call") {
    // the shared test session is built withExtensions(new GraftExtensions) —
    // this proves the spark.sql.extensions path end-to-end
    val ps = Array.tabulate(5)(i => graft.model.Posting(i * 3L + 1, 1 + i, 10))
    val blob = PostingCodec.encode(ps, (tf, dl) => tf.toDouble / dl, blockSize = 4)
    val out = spark.sql(s"SELECT size(vb_decode(X'${blob.map("%02x".format(_)).mkString}'))")
      .collect()(0).getInt(0)
    assert(out == 5)
  }

  test("vb_decode expression round-trips blobs in SQL and Column form") {
    VbDecode.register(spark)
    val ps = Array.tabulate(300)(i => Posting(i * 5L + 1, 1 + i % 9, 10 + i % 50))
    val blob = PostingCodec.encode(ps, (tf, dl) => tf.toDouble / dl, blockSize = 32)
    val df = Seq((1, blob)).toDF("id", "blob")
    df.createOrReplaceTempView("blobs")

    // SQL form (dl lives in the norms sidecar, not in the blob)
    val viaSql = spark.sql(
      "SELECT p.docId, p.tf FROM blobs LATERAL VIEW explode(vb_decode(blob)) AS p")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(viaSql.toSeq == ps.map(p => (p.docId, p.tf)).toSeq)

    // Column form
    val viaCol = df.select(org.apache.spark.sql.functions.explode(VbDecode.vb_decode($"blob")).as("p"))
      .select("p.docId", "p.tf")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(viaCol.toSeq == ps.map(p => (p.docId, p.tf)).toSeq)

    // null safety
    val n = spark.sql("SELECT vb_decode(CAST(NULL AS BINARY))").collect()
    assert(n(0).isNullAt(0))

    // arity: wrong argument counts fail analysis instead of crashing with
    // NoSuchElementException (0 args) or silently dropping extras (2 args)
    for (bad <- Seq("SELECT vb_decode()", "SELECT vb_decode(X'00', 42)")) {
      val e = intercept[Exception](spark.sql(bad).collect())
      assert(e.getMessage.contains("exactly 1 argument"), s"for: $bad got: ${e.getMessage}")
    }
  }

  test("vb_decode powers index introspection over real postings") {
    val dir = SparkSpec.tmpDir("graft-vbd")
    graft.build.IndexBuilder.build(spark,
      graft.gen.TranscriptGen.turns(spark, 500, 2).toDF(), dir,
      graft.build.IndexConfig(buckets = 4, chunkDocs = 128))
    VbDecode.register(spark)
    spark.read.parquet(s"$dir/postings").createOrReplaceTempView("postings_v")
    val row = spark.sql(
      """SELECT term, sum(size(vb_decode(blob))) AS df
        |FROM postings_v WHERE field = 'text' GROUP BY term ORDER BY df DESC LIMIT 1""".stripMargin)
      .collect()(0)
    val stats = spark.read.parquet(s"$dir/termstats")
      .filter(org.apache.spark.sql.functions.col("term") === row.getString(0))
      .collect()(0)
    assert(row.getLong(1) == stats.getAs[Long]("df"))
  }
}
