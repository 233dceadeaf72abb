package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library extension point — the idiomatic Spark way to ship plan-level
  * functions with a library: `--conf spark.sql.extensions=graft.GraftExtensions`
  * (or `builder.withExtensions(new GraftExtensions)`) registers the engine's
  * SQL surface in every session with no code. Currently: `vb_decode`
  * (SURVEY §2.10 — the posting-codec Catalyst expression, for index
  * introspection like `SELECT term, explode(vb_decode(blob)) FROM postings`).
  * All graft entry points (Sessions.local, the test harness) attach this, so
  * the function is available in SQL everywhere without VbDecode.register. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vb_decode"),
      new ExpressionInfo(classOf[graft.functions.VbDecode].getName, "vb_decode"),
      (exprs: Seq[Expression]) => graft.functions.VbDecode.builder(exprs)))
  }
}
