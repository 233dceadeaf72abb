package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import graft.build.{IndexBuilder, IndexConfig}
import graft.gen.TranscriptGen

/** Physical-plan assertions — the scale contract (SURVEY.md §4): partition
  * pruning on the bucket shard column (R1), parquet filter pushdown, and
  * broadcastability of the hits-side join. These guard against regressions
  * that would silently turn a 40 KB-per-term read into a full index scan at
  * 100 TB. */
class PlanSpec extends SparkFunSuite {

  lazy val dir: String = {
    val d = SparkSpec.tmpDir("graft-plan")
    IndexBuilder.build(spark, TranscriptGen.turns(spark, 2000, 4).toDF(), d,
      IndexConfig(buckets = 8, chunkDocs = 512))
    d
  }

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("postings scan is bucket-partition-pruned and term-pushed") {
    val b = IndexBuilder.bucketOf("error", 8)
    val df = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket") === b && col("term") === "error" && col("field") === "text")
    df.collect() // force planning with runtime filters resolved
    val plan = executedPlan(df)
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"no partition pruning in:\n$plan")
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(term,error)"),
      s"term filter not pushed in:\n$plan")
    // only ONE bucket directory is actually read
    val parts = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(parts.contains(1), s"expected 1 selected partition, got $parts")
  }

  test("docstore fetch pushes docId IN-filter to parquet") {
    val df = spark.read.parquet(s"$dir/docstore")
      .filter(col("docId").isin(3L, 99L, 1500L))
    val plan = executedPlan(df)
    assert(plan.contains("PushedFilters") && plan.contains("In(docId"),
      s"docId filter not pushed in:\n$plan")
  }

  test("column pruning: projecting (term) reads only needed columns") {
    val df = spark.read.parquet(s"$dir/postings").select("term")
    val plan = executedPlan(df)
    assert(plan.contains("ReadSchema: struct<term:string>"),
      s"column pruning missing in:\n$plan")
  }

  test("whole-stage codegen covers the tokenize pipeline") {
    val occs = IndexBuilder.termOccs(
      spark.read.parquet(s"$dir/docstore").select("docId", "text", "role", "tool"))
    occs.collect() // execute THIS queryExecution so AQE finalizes its plan
    val plan = executedPlan(occs)
    // AQE renders codegen spans as "*(n)" stage markers
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), s"no codegen in:\n$plan")
  }
}
