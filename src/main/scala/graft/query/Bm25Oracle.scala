package graft.query

import graft.analyze.Analyzers
import graft.model.DocTurn

/** Brute-force BM25 oracle — plain Scala collections, no index, no Spark
  * (SURVEY.md §5.3 item 2). Shares Bm25's constants/functions and sums
  * per-term contributions in query order so the engine must equal it to the
  * last bit: same idf, same avgdl (Long token sum / Long doc count, matching
  * Spark's Average of an integer column), same tie-break (score desc, docId
  * asc — the reference's native order, doc_gz_client.go:101-103).
  */
object Bm25Oracle {

  final case class OracleIndex(
      numDocs: Long,
      avgdl: Map[String, Double],
      // (field, term) -> docId -> tf
      tfs: Map[(String, String), Map[Long, Int]],
      // (field, docId) -> dl
      dls: Map[(String, Long), Int],
      texts: Map[Long, String])

  val Fields: Seq[String] = Seq("text", "role", "tool")

  def buildIndex(docs: Seq[DocTurn]): OracleIndex = {
    val tfs = scala.collection.mutable.HashMap[(String, String), scala.collection.mutable.HashMap[Long, Int]]()
    val dls = scala.collection.mutable.HashMap[(String, Long), Int]()
    val dlSums = scala.collection.mutable.HashMap[String, Long]().withDefaultValue(0L)
    docs.foreach { d =>
      Fields.foreach { f =>
        val value = f match { case "text" => d.text; case "role" => d.role; case "tool" => d.tool }
        val toks = Analyzers.byField(f).tokens(value)
        dls((f, d.docId)) = toks.length
        dlSums(f) += toks.length
        toks.groupBy(identity).foreach { case (t, occ) =>
          tfs.getOrElseUpdate((f, t), scala.collection.mutable.HashMap()) (d.docId) = occ.length
        }
      }
    }
    val n = docs.length.toLong
    OracleIndex(
      numDocs = n,
      avgdl = Fields.map(f => f -> dlSums(f).toDouble / n.toDouble).toMap,
      tfs = tfs.map { case (k, v) => k -> v.toMap }.toMap,
      dls = dls.toMap,
      texts = docs.map(d => d.docId -> d.text).toMap)
  }

  /** Exact top-k: (docId, score), ordered score desc then docId asc. */
  def topK(ix: OracleIndex, q: SearchQuery): Seq[(Long, Double)] = {
    val postings = q.terms.map(t => ix.tfs.getOrElse(t, Map.empty[Long, Int]))
    if (postings.exists(_.isEmpty)) return Seq.empty
    val cand = postings.map(_.keySet).reduce(_ intersect _)
    val idfs = q.terms.map(t => Bm25.idf(ix.numDocs, ix.tfs(t).size.toLong))
    val scored = cand.toSeq.map { d =>
      var s = 0.0
      var i = 0
      while (i < q.terms.length) {
        val (f, _) = q.terms(i)
        s += idfs(i) * Bm25.tfNorm(postings(i)(d), ix.dls((f, d)), ix.avgdl(f))
        i += 1
      }
      (d, s)
    }
    scored.sortBy { case (d, s) => (-s, d) }.take(q.k)
  }

  /** Reference stats semantics (module/poseidon.go:125-131). */
  def stats(ix: OracleIndex, q: SearchQuery): SearchStats = {
    val postings = q.terms.map(t => ix.tfs.getOrElse(t, Map.empty[Long, Int]))
    if (postings.exists(_.isEmpty)) return SearchStats(0, 0, 0)
    if (q.terms.size == 1) {
      val m = postings.head
      SearchStats(m.size.toLong, m.values.map(_.toLong).sum, m.size.toLong)
    } else {
      val total = postings.map(_.keySet).reduce(_ intersect _).size.toLong
      SearchStats(total, total, total)
    }
  }
}
