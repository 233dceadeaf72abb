package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic documents -> transcripts derivation used by the driver gate.
  *
  * The driver's testdata has no transcript-shaped table, so the gate corpus is
  * derived 1:1 from `documents.parquet` with a transformation that is also
  * expressible in the DuckDB oracle SQL (see SparkEntry.oracleSql TRANSCRIPT
  * prefix): 8 turns per conversation, text kept verbatim (per-turn text
  * equality invariant rides on this column).
  *
  * doc_id is dense 0..N-1 and (conv_id, turn_idx) ordering == doc_id ordering,
  * so the engine's rank-assigned docId must equal doc_id — itself asserted by
  * the ft_docids gate query.
  */
object Transcripts {

  def fromDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id"),
        format_string("conv-%08d", expr("doc_id DIV 8")).as("conv_id"),
        (col("doc_id") % 8).cast("int").as("turn_idx"),
        expr("CASE (doc_id % 8) % 4 WHEN 0 THEN 'user' WHEN 2 THEN 'tool' ELSE 'assistant' END").as("role"),
        col("text"),
        expr("CASE WHEN (doc_id % 8) % 4 = 2 THEN 'tool-' || CAST(doc_id % 16 AS STRING) ELSE '' END").as("tool"),
        expr("timestamp'2026-01-01 00:00:00' + make_dt_interval(0, 0, 0, (doc_id DIV 8) * 37 + (doc_id % 8) * 5)").as("ts"))
  }

  /** The same derivation as a DuckDB CTE — prepended to every ft_* oracle. */
  val DuckdbCte: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         printf('conv-%08d', doc_id // 8) AS conv_id,
      |         CAST(doc_id % 8 AS INT) AS turn_idx,
      |         CASE (doc_id % 8) % 4 WHEN 0 THEN 'user' WHEN 2 THEN 'tool' ELSE 'assistant' END AS role,
      |         text,
      |         CASE WHEN (doc_id % 8) % 4 = 2 THEN 'tool-' || CAST(doc_id % 16 AS VARCHAR) ELSE '' END AS tool
      |  FROM documents
      |), tok AS (
      |  SELECT t.doc_id, tt.term
      |  FROM t, unnest(regexp_extract_all(lower(t.text), '[a-z0-9]+')) AS tt(term)
      |  WHERE length(tt.term) BETWEEN 2 AND 40
      |), tf AS (
      |  SELECT doc_id, term, CAST(count(*) AS INT) AS tf FROM tok GROUP BY 1, 2
      |), dl AS (
      |  SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1
      |), corpus AS (
      |  SELECT (SELECT count(*) FROM t) AS n,
      |         (SELECT CAST(sum(dl) AS DOUBLE) FROM dl) / (SELECT count(*) FROM t) AS avgdl
      |), df AS (
      |  SELECT term, count(*) AS df FROM tf GROUP BY 1
      |)""".stripMargin
}
