package graft

import org.apache.spark.sql.functions._
import graft.analyze.{TextAnalyzer, KeywordAnalyzer}
import graft.gen.TranscriptGen

class AnalyzerSpec extends SparkFunSuite {
  import spark.implicits._

  test("scala and Column tokenization agree exactly on generated + edge texts") {
    val texts = (0L until 500L).map(t => TranscriptGen.turnAt(t).text) ++ Seq(
      "", "   ", "a", "ab", "AB cd EF", "x1y2", "tab\tsep  multi   space",
      "punct,.;:!?-_()[]{}", "UPPER lower MiXeD", "0123456789 123 12345",
      "very" + "long" * 20 + "token endshere", "ünïcode émoji ☃ mixed ascii",
      "dash-joined under_scored dot.sep slash/sep", null)
    val df = texts.toDF("text")
    // STRICT parity: the Column form must never return null (null text ->
    // empty array), so no coalescing here — a null row fails the getSeq
    val viaCol = df.select(TextAnalyzer.tokensCol(col("text")).as("toks"))
      .collect().map { r =>
        assert(!r.isNullAt(0), "tokensCol returned NULL — must be empty array")
        r.getSeq[String](0).toList
      }
    texts.zip(viaCol).foreach { case (t, colToks) =>
      assert(TextAnalyzer.tokens(t).toList == colToks, s"text=<$t>")
    }
  }

  test("keyword analyzer scala/Column parity") {
    val vals = Seq("", "  ", "Grep", " READ_file ", "tool-7", null, "a")
    val df = vals.toDF("v")
    val viaCol = df.select(KeywordAnalyzer.tokensCol(col("v")).as("toks"))
      .collect().map { r =>
        assert(!r.isNullAt(0), "tokensCol returned NULL — must be empty array")
        r.getSeq[String](0).toList
      }
    vals.zip(viaCol).foreach { case (v, colToks) =>
      assert(KeywordAnalyzer.tokens(v).toList == colToks, s"v=<$v>")
    }
  }

  test("quality band: length 2..40 enforced") {
    assert(TextAnalyzer.tokens("a bc d e fg") == Seq("bc", "fg"))
    val long41 = "x" * 41
    val long40 = "y" * 40
    assert(TextAnalyzer.tokens(s"$long41 $long40") == Seq(long40))
  }

  test("generator is deterministic and parallelism-invariant") {
    val a = TranscriptGen.turns(spark, 1000, 2).collect().sortBy(t => (t.conv_id, t.turn_idx))
    val b = TranscriptGen.turns(spark, 1000, 8).collect().sortBy(t => (t.conv_id, t.turn_idx))
    assert(a.toSeq == b.toSeq)
    // needles are present and unique
    val needles = a.flatMap(t => "needle-\\d+".r.findAllIn(t.text))
    assert(needles.length == needles.distinct.length && needles.nonEmpty)
  }
}
