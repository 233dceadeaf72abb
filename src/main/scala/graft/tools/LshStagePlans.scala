package graft.tools

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Plan evidence for the LSH signature/candidate stage (diagnostic main).
  *
  * The gate plans (PlanDump) cannot show this stage: verifyCandidatePairs
  * materializes the candidate frame via localCheckpoint at plan-build time,
  * so the explained gate plan starts at `Scan ExistingRDD` and the
  * signature/band subtree never appears in it. This tool explains the
  * candidate frame itself — `after` is the live pipeline
  * (kernel signatures + posexplode bands), `before` re-states the former
  * explode + 16-column-min-agg + fresh-join pipeline inline (the same
  * re-statement OpsSpec uses for value parity). */
object LshStagePlans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r06")
    val spark = graft.Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-lshplans")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Files.createDirectories(Path.of(outDir))
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.write(Path.of(outDir, s"$name.txt"), s.getBytes("UTF-8"))
      println(s"[lshplans] $name -> $outDir/$name.txt")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val freshFrom = 400L

    // shared set-group stage (unchanged between the two forms)
    val sets = docs.select(col("doc_id"), Dedup.tokenSetC(col("text")).as("ts"))
      .filter(size(col("ts")) > 0)
    val groups = sets.groupBy("ts")
      .agg(sort_array(collect_list(col("doc_id"))).as("members"))
      .withColumn("sid", element_at(col("members"), 1))

    // ---- BEFORE (round-5 shape, re-stated): token explode -> h32 ->
    // groupBy(sid) 16-column min-agg -> fresh join -> numBands-way union of
    // band projections -> self-join ----
    val tok = groups.select(col("sid"), explode(col("ts")).as("term"))
      .withColumn("h", Dedup.h32(col("term")))
    val hashes = (0 until Dedup.NumHashes).map { j =>
      min((col("h") * Dedup.hashA(j) + Dedup.hashB(j)) % Dedup.MinhashP).as(s"mh$j")
    }
    val mhOld = tok.groupBy("sid").agg(hashes.head, hashes.tail: _*)
      .select(col("sid"),
        array((0 until Dedup.NumHashes).map(j => col(s"mh$j")): _*).as("mhs"))
      .join(groups.select(col("sid"),
        (element_at(col("members"), -1) >= lit(freshFrom)).as("fresh")), "sid")
    val numBands = Dedup.NumHashes / Dedup.BandRows
    val bandsOld = (0 until numBands).map { b =>
      mhOld.select(col("sid"), col("mhs"), col("fresh"), lit(b).as("band"),
        xxhash64(slice(col("mhs"), b * Dedup.BandRows + 1, Dedup.BandRows)).as("sigh"))
    }.reduce(_ unionAll _)
    val candOld = bandsOld.as("x").join(bandsOld.as("y"),
        col("x.band") === col("y.band") && col("x.sigh") === col("y.sigh") &&
          col("x.sid") < col("y.sid") && (col("x.fresh") || col("y.fresh")))
      .select(col("x.sid").as("sa"), col("y.sid").as("sb"))
    dump("lsh_candidates_before", candOld)

    // ---- AFTER (live): compiled per-set signature kernel + fresh flag in
    // one narrow map, single posexplode band projection, same self-join ----
    val mhNew = groups.select(col("sid"), col("ts"), col("members"))
      .as[(Long, Array[String], Array[Long])]
      .map { case (sid, ts, members) =>
        (sid, Dedup.minhashOfTerms(ts), members.last >= freshFrom)
      }
      .toDF("sid", "mhs", "fresh")
    val bandsNew = mhNew.select(col("sid"), col("mhs"), col("fresh"),
      posexplode(array((0 until numBands).map(b =>
        xxhash64(slice(col("mhs"), b * Dedup.BandRows + 1, Dedup.BandRows))): _*))
        .as(Seq("band", "sigh")))
    val candNew = bandsNew.as("x").join(bandsNew.as("y"),
        col("x.band") === col("y.band") && col("x.sigh") === col("y.sigh") &&
          col("x.sid") < col("y.sid") && (col("x.fresh") || col("y.fresh")))
      .select(col("x.sid").as("sa"), col("y.sid").as("sb"))
    dump("lsh_candidates_after", candNew)
    spark.stop()
  }
}
