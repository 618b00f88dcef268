package graft.tools

/** Calibration probe for [[graft.Bench.ControlRefSec]]: prints several
  * samples of the fixed single-thread CPU control on the current host.
  * Run on a QUIET machine; the min across a quiet session is the
  * reference the bench's `host_factor` divides by (BENCH_NOTES.md
  * round 8 records the calibration).
  */
object HostControlProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5
    for (i <- 1 to n) {
      val s = graft.Bench.cpuControl(reps = 1)
      println(f"control sample $i: $s%.4f s")
    }
    println(f"best of a 3-rep call (the bench's sampling): ${graft.Bench.cpuControl()}%.4f s")
    println(f"pinned ControlRefSec: ${graft.Bench.ControlRefSec}%.3f s")
  }
}
