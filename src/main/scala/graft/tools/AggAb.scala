package graft.tools

/** Interleaved A/B of the postings-grouping paths (sort-based vs hash UDAF,
  * IndexBuilder aggMode) inside ONE taskset-bound JVM: pairs of
  * (sort rep, hash rep) alternate back-to-back so both arms sample the same
  * host-speed regime — sequential whole-arm runs on this host systematically
  * favor whichever arm lands in the quieter window (observed: the same arm
  * "won" by 9% or lost by 13% depending only on run order). Launch with
  * taskset + -XX:ActiveProcessorCount like a scaling leg.
  * Args: cpus turns pairs. */
object AggAb {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val turns = args(1).toLong
    val pairs = args(2).toInt
    val s = graft.Sessions.local(cpus, s"agg-ab-$cpus")
    s.sparkContext.setLogLevel("ERROR")
    // warm BOTH paths (each has its own codegen/JIT surface)
    s.conf.set("graft.agg", "sort")
    ScalingLeg.buildOnce(s, 50000L, s"/tmp/graft-ab-warm-$cpus")
    s.conf.set("graft.agg", "hash")
    ScalingLeg.buildOnce(s, 50000L, s"/tmp/graft-ab-warm-$cpus")
    val sortReps = scala.collection.mutable.ArrayBuffer.empty[Double]
    val hashReps = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (i <- 1 to pairs) {
      s.conf.set("graft.agg", "sort")
      sortReps += ScalingLeg.buildOnce(s, turns, s"/tmp/graft-ab-idx-$cpus")
      s.conf.set("graft.agg", "hash")
      hashReps += ScalingLeg.buildOnce(s, turns, s"/tmp/graft-ab-idx-$cpus")
      println(f"[aggab] pair $i/$pairs: sort=${sortReps.last}%.1fs hash=${hashReps.last}%.1fs")
      Console.flush()
    }
    println(f"[aggab] cpus=$cpus turns=$turns sort min=${sortReps.min}%.2fs " +
      f"reps=${sortReps.map(t => f"$t%.1f").mkString("/")} | " +
      f"hash min=${hashReps.min}%.2fs reps=${hashReps.map(t => f"$t%.1f").mkString("/")} | " +
      f"sort/hash=${sortReps.min / hashReps.min}%.3f")
    s.stop()
  }
}
