package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Core data model of the engine.
  *
  * The input table shape follows the reference's "log line" re-targeted at
  * multi-turn transcripts (see /root/reference docs/get_started.md:139-158 for
  * the original field/keyword model and SURVEY.md §1.3 for the mapping).
  */

/** One transcript turn — the engine's only input row shape. */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** A turn with its assigned stable docId (rank of (conv_id, turn_idx)). */
final case class DocTurn(
    docId: Long,
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** One term occurrence emitted by the analyzer: the analog of the reference
  * mapper's `token \t field \t docid,rowIdx \t 1` intermediate row
  * (reference builder/index/.../LogParser.java:21-53).
  * `dl` is the doc length (analyzer token count of the turn's `text`) carried
  * along so BM25 scoring is local to the posting (Lucene-style norms).
  */
final case class TermOcc(field: String, term: String, docId: Long, tf: Int, dl: Int)

/** A decoded posting entry. */
final case class Posting(docId: Long, tf: Int, dl: Int)

/** Per-(field,term) statistics — the reference's posting-list header
  * `(uv, pv)` made explicit (reference InvertedIndexGenerateReducer.java:390-395):
  * df = distinct docs (uv), pv = total occurrences.
  */
final case class TermStats(field: String, term: String, bucket: Int, df: Long, pv: Long)

object Schemas {
  val turn: StructType = StructType(Seq(
    StructField("conv_id", StringType),
    StructField("turn_idx", IntegerType),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType)))
}

/** Build-wide corpus statistics needed by BM25 at query time. */
final case class CorpusStats(numDocs: Long, avgDl: Double, totalTokens: Long)

/** One completed unit of index build — the resumable-checkpoint manifest row
  * (analog of the reference's gzmeta + fname_begin_docid side files,
  * docs/build_inverted_index.md:71-99).
  */
final case class BucketManifest(
    buildId: String,
    bucket: Int,
    terms: Long,
    postingsBytes: Long,
    wallMs: Long,
    attempt: Int,
    finishedAt: String)
