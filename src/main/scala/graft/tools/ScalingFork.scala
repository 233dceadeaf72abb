package graft.tools

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
    * run on the host's 31 idle cores for free and deflate measured scaling. */
  private def affinity(cpus: Int): Seq[String] = {
    val taskset = new java.io.File("/usr/bin/taskset")
    if (!taskset.canExecute) return Seq.empty
    // offset 8: keep off core 0 (interrupt-heavy on VMs)
    Seq(taskset.getAbsolutePath, "-c", s"8-${8 + cpus - 1}")
  }

  /** Run one leg in a fresh JVM bound to `cpus` cores; returns best wall
    * seconds over `reps` post-warmup builds. */
  def runLeg(cpus: Int, turns: Long, reps: Int): Double = {
    val java = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val cmd = affinity(cpus) ++
      Seq(java, s"-XX:ActiveProcessorCount=$cpus") ++ inheritedJvmArgs ++
      Seq("-cp", cp, "graft.tools.ScalingLeg", cpus.toString, turns.toString, reps.toString)
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(false)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val err = new String(proc.getErrorStream.readAllBytes(), "UTF-8")
    val rc = proc.waitFor()
    val m = "LEGSEC=([0-9.]+)".r.findFirstMatchIn(out)
    m match {
      case Some(g) => g.group(1).toDouble
      case None =>
        throw new IllegalStateException(
          s"scaling leg (cpus=$cpus) failed rc=$rc\nstdout:\n$out\nstderr tail:\n${err.takeRight(2000)}")
    }
  }

  /** (secLow, secHigh, efficiency) for the N vs 4N protocol. */
  def measure(turns: Long, lowCpus: Int, highCpus: Int,
              lowReps: Int, highReps: Int): (Double, Double, Double) = {
    val secLow = runLeg(lowCpus, turns, lowReps)
    val secHigh = runLeg(highCpus, turns, highReps)
    val eff = (secLow / secHigh) / (highCpus.toDouble / lowCpus)
    (secLow, secHigh, eff)
  }
}
