package graft.tools

/** Runs just Bench's scaling section (diagnostic): forked JVM per leg,
  * taskset-bound, reps interleaved low/high (see ScalingLeg/ScalingFork).
  * Args: [turns] [lowCpus] [pairs]. */
object ScalingOnly {
  def main(args: Array[String]): Unit = {
    val turns = args.headOption.map(_.toLong).getOrElse(600000L)
    val low = args.lift(1).map(_.toInt).getOrElse(1)
    val pairs = args.lift(2).map(_.toInt).getOrElse(4)
    val (l, h, eff, pairEffs) = ScalingFork.measureInterleaved(turns, low, 4 * low, pairs)
    println(f"[scaling] turns=$turns low=${low}c min=${l.best}%.1fs med=${l.median}%.1fs reps=${l.reps.map(t => f"$t%.1f").mkString("/")} cpus=${l.cpusAllowed} " +
      f"high=${4 * low}c min=${h.best}%.1fs med=${h.median}%.1fs reps=${h.reps.map(t => f"$t%.1f").mkString("/")} cpus=${h.cpusAllowed} " +
      f"bound=${l.bound && h.bound} pair_effs=${pairEffs.map(e => f"$e%.3f").mkString("/")} efficiency=$eff%.3f")
  }
}
