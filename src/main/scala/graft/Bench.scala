package graft

import org.apache.spark.sql.SparkSession
import graft.build.{IndexBuilder, IndexConfig}
import graft.gen.TranscriptGen
import graft.query.{QueryEngine, SearchQuery}

/** Per-round benchmark. Emits ONE JSON line:
  *   {"metric":"total","value":<gate-query total sec>,"unit":"sec",
  *    "queries":{...per gate query sec...},"sf":"<dir>",
  *    "index_build":{...}, "query_latency":{...}, "scaling":{...}}
  *
  * The scaling section evidences the north rule's two-cluster-size criterion
  * in this sandbox (no real cluster): the SAME index-build job runs in two
  * freshly forked, taskset-bound JVMs (N and 4N cores — executor-container
  * simulation; see ScalingFork) on the same input; efficiency =
  * (thr4N / thrN) / 4. Protocol and measured ladder in BASELINE.md.
  */
object Bench {

  private def session(cpus: Int): SparkSession = Sessions.local(cpus, s"graft-bench-$cpus")

  private def rm(dir: String): Unit =
    FsUtil.deleteRecursively(new java.io.File(dir))

  private def timeIt[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Build over n generated turns; returns wall seconds. */
  private def buildOnce(spark: SparkSession, n: Long, dir: String): Double = {
    rm(dir)
    val (_, sec) = timeIt {
      IndexBuilder.build(spark, TranscriptGen.turns(spark, n).toDF(), dir,
        IndexConfig(buckets = 32, chunkDocs = 1L << 14))
    }
    sec
  }

  val QuerySet: Seq[(String, SearchQuery)] = Seq(
    "single_common" -> SearchQuery.of(Seq("text" -> Seq("the")), 10),
    "single_mid" -> SearchQuery.of(Seq("text" -> Seq("error")), 10),
    "and2" -> SearchQuery.of(Seq("text" -> Seq("error", "timeout")), 10),
    "and3_crossfield" -> SearchQuery.of(Seq("text" -> Seq("error"), "tool" -> Seq("grep")), 10),
    "rare_needle" -> SearchQuery.of(Seq("text" -> Seq("needle-000003")), 10),
    "stopword_k100" -> SearchQuery.of(Seq("text" -> Seq("ok")), 100))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchTurns = sys.env.getOrElse("SPARK_GRAFT_BENCH_TURNS", "150000").toLong
    val sb = new StringBuilder

    // ---- 0. scaling FIRST, while this JVM is still Spark-free ----
    // Protocol per BASELINE.md round 2: each leg forks a fresh JVM
    // taskset-bound to exactly N cores with -XX:ActiveProcessorCount=N —
    // the budget a real N-core executor container gets from its cgroup
    // cpuset. Each leg warms up (50k-turn build) then best-of-reps damps
    // CPU-steal spikes. Runs BEFORE any parent-JVM SparkSession: a parent
    // that has already run the 32-thread gate degrades the 4-core leg ~20%
    // (measured 57s -> 70s) and the measurement must not inherit that.
    // MIN-of-reps per leg, both legs (see LegResult scaladoc: host CPU steal
    // is one-sided noise — it only inflates — so min estimates each leg's
    // uncontended time; median was tried in round 3 and still passed a
    // majority-contaminated 4c leg through). Round 5: reps are INTERLEAVED
    // (low,high,low,high,…) between two live leg JVMs on disjoint cpusets —
    // sequential whole-legs ran ~10 min apart and a host-regime shift
    // between them skewed min-per-leg (round-4 driver record 0.751 vs three
    // same-code quiet measurements 0.85x); back-to-back pairs make both
    // legs sample the same regime. All reps (aligned by pair) + medians +
    // per-leg Cpus_allowed go into the JSON so outliers and binding
    // failures are visible in the record itself.
    val scaleTurns = sys.env.getOrElse("SPARK_GRAFT_SCALE_TURNS", "600000").toLong
    val scalePairs = sys.env.getOrElse("SPARK_GRAFT_SCALE_PAIRS", "4").toInt
    val lowCpus = 1
    val highCpus = 4
    val (legLow, legHigh, eff, pairEffs) =
      graft.tools.ScalingFork.measureInterleaved(scaleTurns, lowCpus, highCpus, scalePairs)
    val secLow = legLow.best
    val secHigh = legHigh.best
    val thrLow = scaleTurns / secLow
    val thrHigh = scaleTurns / secHigh

    // ---- 1. gate queries over the driver's sf tables ----
    var spark = session(cpus)
    // setup, not query time: the ft_* gate queries share one on-disk index
    // (GateIndex); build it before the loop so the first ft_* query's number
    // is a query, not a query+index-build (build throughput is reported
    // separately in index_build below)
    try graft.ops.GateIndex.engine(spark, sfDir)
    catch { case e: Throwable => System.err.println(s"[bench] gate index: ${e.getMessage}") }
    def gatePass() = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (_, sec) = timeIt {
        try fn(spark, sfDir).count()
        catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}"); -1L }
      }
      name -> sec
    }
    // contamination defense (round-3 lesson: single-shot figures taken in a
    // CPU-steal window misrepresented the code by ~7x; the scaling section
    // survived because it takes min-of-N with per-rep evidence) — re-run the
    // 5 heaviest queries and keep min-of-2, emitting both reps in the record
    val pass1 = gatePass()
    val heavy = pass1.sortBy(-_._2).take(5).map(_._1).toSet
    val rep2 = SparkEntry.queries.toSeq.filter(t => heavy(t._1)).sortBy(_._1).map {
      case (name, fn) =>
        val (_, sec) = timeIt {
          try fn(spark, sfDir).count()
          catch { case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}"); -1L }
        }
        name -> sec
    }.toMap
    val gate = pass1.map { case (name, s1) =>
      name -> rep2.get(name).map(math.min(s1, _)).getOrElse(s1)
    }
    val gateTotal = gate.map(_._2).sum

    // ---- 2. index build (min-of-3, per-rep evidence) at local[cpus] ----
    val idxDir = s"/tmp/graft-bench-idx-$cpus"
    val buildReps = (1 to 3).map(_ => buildOnce(spark, benchTurns, idxDir))
    val buildSec = buildReps.min
    // size evidence: INDEX bytes (postings + termstats + norms — the
    // docstore is document storage, not index) / total postings (sum of df
    // over the term dictionary) — the storage-footprint claim in the
    // record, not just in BASELINE.md prose
    val indexBytes = Seq("postings", "termstats", "norms").map { d =>
      val f = new java.io.File(idxDir, d)
      require(f.isDirectory, // fail loudly on layout drift, never report ~0
        s"index layout drift: expected subdir '$d' under $idxDir")
      FsUtil.dirSize(f)
    }.sum
    val docstoreBytes = FsUtil.dirSize(new java.io.File(idxDir, "docstore"))
    val totalPostings = {
      val v = spark.read.parquet(s"$idxDir/termstats")
        .agg(org.apache.spark.sql.functions.sum("df")).collect()(0)
      if (v.isNullAt(0)) 0L else v.getLong(0) // empty termstats -> SQL NULL
    }
    spark.stop()
    // serving profile: AQE off — adaptive re-planning costs ~80 ms per
    // interactive query and buys nothing for 1-2-task top-k jobs (it stays
    // on for builds, where it right-sizes the big shuffles)
    spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-serve")
      .config("spark.sql.shuffle.partitions", Sessions.ShufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", Sessions.localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val engine = new QueryEngine(spark, idxDir)
    // warmup once, then 5 reps per query, collect all latencies
    QuerySet.foreach { case (_, q) => engine.topK(q).collect() }
    val lat = scala.collection.mutable.ArrayBuffer[Double]()
    val perQ = QuerySet.map { case (name, q) =>
      val times = (1 to 5).map { _ => val (_, s) = timeIt(engine.topK(q).collect()); s }
      lat ++= times
      name -> times.sum / times.size
    }
    val sorted = lat.sorted
    def pct(p: Double) = sorted((p * (sorted.size - 1)).round.toInt)
    spark.stop()

    def jm(pairs: Seq[(String, Double)]): String =
      pairs.map { case (k, v) => f""""$k":$v%.4f""" }.mkString("{", ",", "}")
    def ja(xs: Seq[Double]): String = xs.map(x => f"$x%.2f").mkString("[", ",", "]")

    sb.append(s"""{"metric":"total","value":${f"$gateTotal%.3f"},"unit":"sec"""")
    sb.append(s""","queries":${jm(gate)}""")
    sb.append(s""","queries_rep2":${jm(rep2.toSeq.sortBy(_._1))}""")
    sb.append(s""","queries_aggregation":"min_of_2_for_5_heaviest"""")
    sb.append(s""","sf":"$sfDir"""")
    sb.append(s""","index_build":{"turns":$benchTurns,"sec":${f"$buildSec%.2f"},"reps":${ja(buildReps)},"aggregation":"min_of_3","turns_per_sec":${f"${benchTurns / buildSec}%.0f"},"index_bytes":$indexBytes,"docstore_bytes":$docstoreBytes,"postings":$totalPostings,"bytes_per_posting":${f"${indexBytes.toDouble / math.max(1L, totalPostings)}%.2f"}}""")
    sb.append(s""","query_latency":{"p50_ms":${f"${pct(0.5) * 1000}%.1f"},"p99_ms":${f"${pct(0.99) * 1000}%.1f"},"per_query_ms":${jm(perQ.map { case (k, v) => k -> v * 1000 })}}""")
    sb.append(s""","scaling":{"turns":$scaleTurns,"cpus_low":$lowCpus,"cpus_high":$highCpus,"sec_low":${f"$secLow%.2f"},"sec_high":${f"$secHigh%.2f"},"sec_low_median":${f"${legLow.median}%.2f"},"sec_high_median":${f"${legHigh.median}%.2f"},"reps_low":${ja(legLow.reps)},"reps_high":${ja(legHigh.reps)},"cpus_allowed_low":"${legLow.cpusAllowed}","cpus_allowed_high":"${legHigh.cpusAllowed}","bound":${legLow.bound && legHigh.bound},"aggregation":"min_per_leg_uncontended","protocol":"interleaved_pairs_high_best_of_2_identical_plan","shuffle_partitions":${2 * highCpus},"pair_eff":${ja(pairEffs)},"thr_low":${f"$thrLow%.0f"},"thr_high":${f"$thrHigh%.0f"},"efficiency":${f"$eff%.3f"}}""")
    sb.append("}")
    println(sb.toString)
  }
}
