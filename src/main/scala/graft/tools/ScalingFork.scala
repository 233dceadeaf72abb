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
    * the leg result and the bench JSON) instead of silently degrading. */
  private def affinity(cpus: Int): (Seq[String], Boolean) = {
    val taskset = new java.io.File("/usr/bin/taskset")
    val online = Runtime.getRuntime.availableProcessors
    if (!taskset.canExecute) {
      System.err.println("[scaling] WARNING: taskset unavailable — leg runs UNBOUND; " +
        "unbound small legs overstate their throughput and deflate efficiency (BASELINE.md protocol)")
      return (Seq.empty, false)
    }
    // preferred offset 8: keep off core 0 (interrupt-heavy on VMs); fall
    // back to offset 0 on small hosts, unbound (loudly) if cpus > online
    val offset =
      if (8 + cpus <= online) 8
      else if (cpus <= online) 0
      else {
        System.err.println(s"[scaling] WARNING: host has $online cores < requested $cpus — leg runs UNBOUND")
        return (Seq.empty, false)
      }
    (Seq(taskset.getAbsolutePath, "-c", s"$offset-${offset + cpus - 1}"), true)
  }

  /** Run one leg in a fresh JVM bound to `cpus` cores; `reps` post-warmup
    * builds, every rep's wall time in the result. */
  def runLeg(cpus: Int, turns: Long, reps: Int): LegResult = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val (prefix, bound) = affinity(cpus)
    val cmd = prefix ++
      Seq(javaBin, s"-XX:ActiveProcessorCount=$cpus") ++ inheritedJvmArgs ++
      Seq("-cp", cp, "graft.tools.ScalingLeg", cpus.toString, turns.toString, reps.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(false)
    val proc = pb.start()
    // drain stderr CONCURRENTLY: a leg JVM can write >64 KB of Spark startup
    // WARN/INFO to stderr; reading stdout to EOF first would deadlock both
    // processes on the full stderr pipe
    val errBuf = new java.io.ByteArrayOutputStream()
    val drainer = new Thread(() => try proc.getErrorStream.transferTo(errBuf) catch { case _: Throwable => })
    drainer.setDaemon(true)
    drainer.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val rc = proc.waitFor()
    drainer.join(5000)
    val err = errBuf.toString("UTF-8")
    val repsParsed = "LEGREPS=([0-9.,]+)".r.findFirstMatchIn(out)
      .map(_.group(1).split(',').map(_.toDouble).toSeq)
    val cpusAllowed = "LEGCPUS=([^\r\n]+)".r.findFirstMatchIn(out)
      .map(_.group(1).trim).getOrElse("unknown")
    repsParsed match {
      case Some(ts) if ts.nonEmpty => LegResult(cpus, ts, cpusAllowed, bound)
      case _ =>
        throw new IllegalStateException(
          s"scaling leg (cpus=$cpus) failed rc=$rc\nstdout:\n$out\nstderr tail:\n${err.takeRight(2000)}")
    }
  }

  /** (low, high, efficiency) for the N vs 4N protocol — efficiency from the
    * per-leg MIN reps (uncontended-time estimator; see LegResult). */
  def measure(turns: Long, lowCpus: Int, highCpus: Int,
              lowReps: Int, highReps: Int): (LegResult, LegResult, Double) = {
    val low = runLeg(lowCpus, turns, lowReps)
    val high = runLeg(highCpus, turns, highReps)
    val eff = (low.best / high.best) / (highCpus.toDouble / lowCpus)
    (low, high, eff)
  }
}
