package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Curation pipeline with an attrition funnel report — the bookkeeping every
  * production data-cleaning run needs: which filter dropped how much.
  *
  * A pipeline is an ordered list of named keep-predicates. `apply` returns
  * the surviving documents (one conjunctive filter — Catalyst fuses it into
  * the scan). `funnel` reports per stage how many docs reached it and how
  * many survived, computed in ONE aggregation pass: every predicate becomes
  * a boolean column, survival-to-stage-i is the running AND, and all 2k
  * counts come out of a single hash-agg — no per-stage job, no multiple
  * scans (at 100 TB an N-pass funnel is N scans of the corpus).
  */
object Curate {

  /** Surviving documents: all predicates hold (null-safe: null → drop). */
  def apply(documents: DataFrame, stages: Seq[(String, Column)]): DataFrame =
    documents.filter(stages.map { case (_, p) => coalesce(p, lit(false)) }.reduce(_ && _))

  /** Attrition report: (stage_idx, stage, n_in, n_kept) per stage, where
    * n_in = docs surviving all EARLIER stages and n_kept = docs surviving
    * this one too — one aggregation pass over one scan. */
  def funnel(documents: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val spark = documents.sparkSession
    import spark.implicits._
    val flagged = documents.select(stages.zipWithIndex.map { case ((_, p), i) =>
      coalesce(p, lit(false)).as(s"_c$i")
    }: _*)
    val surv = stages.indices.map { i =>
      (0 to i).map(j => col(s"_c$j")).reduce(_ && _).as(s"_s$i")
    }
    val sums = count(lit(1)).as("_total") +:
      stages.indices.map(i => sum(when(col(s"_s$i"), 1L).otherwise(0L)).as(s"_k$i"))
    val row = flagged.select(surv: _*).agg(sums.head, sums.tail: _*).collect()(0)
    val total = row.getLong(0)
    // empty corpus: count = 0 but sum() over zero rows is SQL NULL
    val kept = stages.indices.map(i => if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1))
    stages.zipWithIndex.map { case ((name, _), i) =>
      val nIn = if (i == 0) total else kept(i - 1)
      (i, name, nIn, kept(i))
    }.toDF("stage_idx", "stage", "n_in", "n_kept")
      .orderBy("stage_idx")
  }
}
