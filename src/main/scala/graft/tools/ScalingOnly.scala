package graft.tools

/** Runs just Bench's scaling section (diagnostic): forked JVM per leg,
  * ActiveProcessorCount pinned (see ScalingLeg/ScalingFork). */
object ScalingOnly {
  def main(args: Array[String]): Unit = {
    val turns = args.headOption.map(_.toLong).getOrElse(600000L)
    val (low, high, eff) = ScalingFork.measure(turns, 1, 4, lowReps = 2, highReps = 3)
    println(f"[scaling] turns=$turns low=1c $low%.1fs high=4c $high%.1fs efficiency=$eff%.3f")
  }
}
