package graft.tools

/** One forked scaling leg's evidence: per-rep wall seconds (post-warmup),
  * the actual Cpus_allowed_list the leg JVM observed (read from
  * /proc/self/status inside the leg — a binding failure is VISIBLE in the
  * record, not inferred), and whether taskset binding was applied.
  *
  * The efficiency ratio uses the MIN rep per leg, applied to BOTH legs.
  * Rationale: this host's contamination (CPU steal from co-tenants) is
  * strictly ONE-SIDED — it only ever inflates a wall time — so min-of-N is
  * the consistent estimator of each leg's uncontended time, which is the
  * quantity the two-cluster-size criterion is about (a real cluster bench
  * would not run with a noisy neighbor on the executor). Median was tried
  * in round 3 and still lets a majority-contaminated leg through (observed
  * 4c reps 54.2/62.1/68.3 s: median 62.1 = contaminated, min 54.2 =
  * repeatable quiet-host figure). Min is symmetric — applied to the 1-core
  * leg it LOWERS the ratio — so this is not a direction-picked statistic;
  * all reps and the median are still emitted so the record shows the noise.
  */
final case class LegResult(cpus: Int, reps: Seq[Double], cpusAllowed: String, bound: Boolean) {
  def median: Double = {
    val s = reps.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }
  /** Fastest rep = least-contaminated observation of the leg's true cost. */
  def best: Double = reps.min
}

/** Forks one JVM per scaling leg (see ScalingLeg) and computes efficiency.
  * Shared by Bench and the ScalingOnly diagnostic. */
object ScalingFork {

  /** Current JVM's module opens + heap flags, replayed into the leg JVM. */
  private def inheritedJvmArgs: Seq[String] = {
    import scala.jdk.CollectionConverters._
    val args = java.lang.management.ManagementFactory.getRuntimeMXBean.getInputArguments.asScala
    args.filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports") ||
      a.startsWith("-Xmx") || a.startsWith("-Xms") || a.startsWith("-XX:+Use")).toSeq
  }

  /** Hard CPU affinity prefix when the OS provides it: an N-core leg is
    * BOUND to N physical cores, so its GC/JIT/shuffle threads compete for
    * exactly the executor-sized budget a real N-core executor container
    * gets (cgroup cpuset). Without binding, the 1-core leg's JVM services
    * run on the host's idle cores for free and deflate measured scaling —
    * so an unbound fallback WARNS LOUDLY and is recorded (bound=false in
    * the leg result and the bench JSON) instead of silently degrading.
    *
    * `offset` is the first core of the cpuset; the interleaved protocol
    * keeps BOTH leg JVMs alive at once, so the two legs must get DISJOINT
    * cpusets (the idle leg blocks in a native stdin read and costs ~nothing,
    * but sharing a core would still serialize GC/daemon wakeups into the
    * active leg's budget). */
  private def affinity(cpus: Int, offset: Int): (Seq[String], Boolean) = {
    val taskset = new java.io.File("/usr/bin/taskset")
    val online = Runtime.getRuntime.availableProcessors
    if (!taskset.canExecute) {
      System.err.println("[scaling] WARNING: taskset unavailable — leg runs UNBOUND; " +
        "unbound small legs overstate their throughput and deflate efficiency (BASELINE.md protocol)")
      return (Seq.empty, false)
    }
    if (offset + cpus > online) {
      System.err.println(s"[scaling] WARNING: host has $online cores < requested $offset+$cpus — leg runs UNBOUND")
      return (Seq.empty, false)
    }
    (Seq(taskset.getAbsolutePath, "-c", s"$offset-${offset + cpus - 1}"), true)
  }

  /** Disjoint cpuset start offsets for the two legs. Preferred base 8 keeps
    * both legs off core 0 (interrupt-heavy on VMs); small hosts fall back to
    * base 0. Low leg first, high leg packed right after it. */
  private def planOffsets(lowCpus: Int, highCpus: Int): (Int, Int) = {
    val online = Runtime.getRuntime.availableProcessors
    if (8 + lowCpus + highCpus <= online) (8, 8 + lowCpus)
    else (0, lowCpus) // affinity() warns+unbinds if even this overflows
  }

  /** A live interactive leg JVM (ScalingLeg --interactive): warmed up, bound
    * to its own cpuset, waiting on stdin for one-rep GO commands. */
  private final class LegProc(val cpus: Int, turns: Long, offset: Int, shufflePartitions: Int) {
    private val errBuf = new java.io.ByteArrayOutputStream()
    val reps = scala.collection.mutable.ArrayBuffer.empty[Double]
    var cpusAllowed: String = "unknown"
    private val (affinityPrefix, boundFlag) = affinity(cpus, offset)
    val bound: Boolean = boundFlag
    private val proc: Process = {
      val javaBin = System.getProperty("java.home") + "/bin/java"
      val cp = System.getProperty("java.class.path")
      val cmd = affinityPrefix ++
        Seq(javaBin, s"-XX:ActiveProcessorCount=$cpus") ++ inheritedJvmArgs ++
        Seq("-cp", cp, "graft.tools.ScalingLeg", cpus.toString, turns.toString, "0",
          "--interactive", shufflePartitions.toString)
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(false)
      pb.start()
    }
    // drain stderr CONCURRENTLY: a leg JVM writes >64 KB of Spark WARN/INFO
    // to stderr; blocking on stdout with a full stderr pipe deadlocks both
    locally {
      val drainer = new Thread(() => try proc.getErrorStream.transferTo(errBuf) catch { case _: Throwable => })
      drainer.setDaemon(true)
      drainer.start()
    }
    private val out = new java.io.BufferedReader(new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
    private val in = new java.io.PrintWriter(new java.io.OutputStreamWriter(proc.getOutputStream, "UTF-8"), true)

    /** Read stdout lines until one starts with `prefix`; fail loudly on EOF. */
    private def await(prefix: String): String = {
      var line = out.readLine()
      while (line != null && !line.startsWith(prefix)) line = out.readLine()
      if (line == null)
        throw new IllegalStateException(
          s"scaling leg (cpus=$cpus) died awaiting $prefix rc=${if (proc.isAlive) "alive" else proc.exitValue()}\n" +
            s"stderr tail:\n${errBuf.toString("UTF-8").takeRight(2000)}")
      line.substring(prefix.length)
    }
    def awaitReady(): Unit = await("LEGREADY")
    /** Run exactly one measured rep and record it. */
    def rep(): Double = {
      in.println("GO")
      val t = await("LEGREP=").toDouble
      reps += t
      t
    }
    def finish(): LegResult = {
      in.println("DONE")
      cpusAllowed = await("LEGCPUS=").trim
      proc.waitFor()
      LegResult(cpus, reps.toSeq, cpusAllowed, bound)
    }
  }

  /** Interleaved N-vs-4N measurement (round-5 protocol): both leg JVMs are
    * started on DISJOINT cpusets and warm up concurrently; then `pairs`
    * rounds of (one low rep, one high rep) run strictly back-to-back, so
    * both legs sample the same host-speed regime. Sequential whole-legs
    * (round ≤4) ran ~10 min apart; a host-regime shift between the legs
    * produced a 0.751 driver record against three same-code quiet-window
    * measurements of 0.85x — min-per-leg cannot correct a shift that spans
    * an entire leg. Efficiency is still min-per-leg over all reps (host
    * steal is one-sided; see LegResult), and the per-pair ratios are in the
    * record via the aligned reps arrays. */
  def measureInterleaved(turns: Long, lowCpus: Int, highCpus: Int,
                         pairs: Int): (LegResult, LegResult, Double, Seq[Double]) = {
    val (loOff, hiOff) = planOffsets(lowCpus, highCpus)
    // both legs run the IDENTICAL job: shuffle partitioning fixed at 2x the
    // high leg's cores (strong scaling — see ScalingLeg's scaladoc)
    val lo = new LegProc(lowCpus, turns, loOff, 2 * highCpus)
    val hi = new LegProc(highCpus, turns, hiOff, 2 * highCpus)
    lo.awaitReady(); hi.awaitReady()
    val pairEffs = scala.collection.mutable.ArrayBuffer.empty[Double]
    var i = 0
    while (i < pairs) {
      // asymmetric sampling: the high leg's rep costs ~1/(efficiency·ratio)
      // of the low leg's, and min-per-leg needs at least ONE quiet rep per
      // leg — two cheap high reps per low rep double the high leg's odds of
      // sampling a quiet window for ~1/3 of the pair's budget (observed:
      // 4 single-high pairs lost 0.03-0.05 of ratio to one-sided 4c spikes
      // that a second adjacent rep dodged)
      val tl = lo.rep()
      val th = math.min(hi.rep(), hi.rep())
      val pe = (tl / th) / (highCpus.toDouble / lowCpus)
      pairEffs += pe
      System.err.println(f"[scaling] pair ${i + 1}/$pairs: ${lowCpus}c=$tl%.1fs ${highCpus}c(best of 2)=$th%.1fs " +
        f"ratio=$pe%.3f")
      i += 1
    }
    val legLow = lo.finish()
    val legHigh = hi.finish()
    val eff = (legLow.best / legHigh.best) / (highCpus.toDouble / lowCpus)
    (legLow, legHigh, eff, pairEffs.toSeq)
  }
}
