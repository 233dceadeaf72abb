package graft.tools

/** Runs just Bench's scaling section (diagnostic): forked JVM per leg,
  * taskset-bound (see ScalingLeg/ScalingFork). Args: [turns] [lowCpus]. */
object ScalingOnly {
  def main(args: Array[String]): Unit = {
    val turns = args.headOption.map(_.toLong).getOrElse(600000L)
    val low = args.lift(1).map(_.toInt).getOrElse(1)
    val (secLow, secHigh, eff) = ScalingFork.measure(turns, low, 4 * low, lowReps = 2, highReps = 3)
    println(f"[scaling] turns=$turns low=${low}c $secLow%.1fs high=${4 * low}c $secHigh%.1fs efficiency=$eff%.3f")
  }
}
