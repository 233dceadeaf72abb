package graft.gen

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.Turn

/** Deterministic synthetic transcript generator (FIXTURES.md §1).
  *
  * Every field is a pure function of the global turn index `t` via a
  * counter-based splitmix64 PRNG — NOT a sequential Random stream — so the
  * generated table is bit-identical at any parallelism (the reference's demo
  * corpus is fetched externally, docs/get_started.md:109-112, hence we
  * synthesize; per BASELINE.json no external data).
  *
  * Structure: conversations `conv-%08d` with 2 + (convId % 14) turns; roles
  * cycle user → assistant → tool → assistant; text = 5..60 tokens, ~30%
  * stopword-like heavy tokens (skew exercise) and the rest Zipf-ish over a
  * 50k vocabulary, plus rare `needle-%06d` exact-match markers; ts = epoch +
  * convId*37s + turn_idx*5s.
  */
object TranscriptGen {

  val Seed = 42L
  val Vocab = 50000
  val Stopwords: IndexedSeq[String] = IndexedSeq(
    "the", "ok", "error", "a", "to", "and", "of", "in", "is", "it",
    "run", "file", "line", "test", "call", "tool", "result", "user", "done", "with",
    "for", "on", "at", "by", "this", "that", "from", "or", "as", "be",
    "not", "are", "was", "if", "then", "else", "true", "false", "null", "none",
    "retry", "timeout", "fail", "pass", "start", "stop", "match", "read", "write", "exec")
  val Tools: IndexedSeq[String] = IndexedSeq(
    "grep", "read_file", "write_file", "bash", "search", "edit", "list_dir", "fetch",
    "run_tests", "compile", "lint", "diff", "commit", "browse", "eval", "plan")

  // turns-per-conversation block structure: convs come in periods of 14 with
  // 2+k turns each; prefix sums let us invert global index -> (conv, turn).
  private val turnsPerConv: Array[Int] = Array.tabulate(14)(k => 2 + k)
  private val prefix: Array[Int] = turnsPerConv.scanLeft(0)(_ + _) // size 15
  private val PeriodTurns: Int = prefix.last // 119
  private val PeriodConvs = 14

  /** splitmix64 of (seed, t, tag, j) — the counter-based PRNG. */
  def mix(t: Long, tag: Long, j: Long): Long = {
    var z = Seed + t * 0x9E3779B97F4A7C15L + tag * 0xBF58476D1CE4E5B9L + j * 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private def uniform(t: Long, tag: Long, j: Long): Double =
    ((mix(t, tag, j) >>> 11).toDouble) / (1L << 53).toDouble

  /** global turn index -> (convId, turnIdx) */
  def locate(t: Long): (Long, Int) = {
    val block = t / PeriodTurns
    val r = (t % PeriodTurns).toInt
    var k = 0
    while (prefix(k + 1) <= r) k += 1
    (block * PeriodConvs + k, r - prefix(k))
  }

  /** Deterministic turn for global index t. */
  def turnAt(t: Long): Turn = {
    val (convId, turnIdx) = locate(t)
    val role = (turnIdx % 4) match {
      case 0 => "user"
      case 2 => "tool"
      case _ => "assistant"
    }
    val tool = if (role == "tool") Tools(((mix(t, 7, 0) >>> 1) % Tools.length).toInt) else ""
    val nTok = 5 + ((mix(t, 1, 0) >>> 1) % 56).toInt
    val sb = new StringBuilder
    var j = 0
    while (j < nTok) {
      if (j > 0) sb.append(' ')
      val u = uniform(t, 2, j)
      if (u < 0.30) {
        sb.append(Stopwords(((mix(t, 3, j) >>> 1) % Stopwords.length).toInt))
      } else {
        // Zipf-ish (p ~ 1/rank) via exponential inverse CDF over the vocab
        val v = uniform(t, 4, j)
        val rank = math.min(Vocab - 1, math.exp(v * math.log(Vocab.toDouble)).toLong).toInt
        sb.append(f"w$rank%06d")
      }
      j += 1
    }
    if (t % 997 == 0) sb.append(f" needle-${t / 997}%06d")
    val ts = new Timestamp(1767225600000L /*2026-01-01T00:00:00Z*/ +
      convId * 37000L + turnIdx * 5000L)
    Turn(f"conv-$convId%08d", turnIdx, role, sb.toString, tool, ts)
  }

  /** Generate `n` turns as a typed Dataset, identical at any parallelism. */
  def turns(spark: SparkSession, n: Long, partitions: Int = 0): Dataset[Turn] = {
    import spark.implicits._
    val p = if (partitions > 0) partitions else spark.sessionState.conf.numShufflePartitions
    spark.range(0, n, 1, p).map(t => turnAt(t))
  }
}
