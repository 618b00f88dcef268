package graft.tools

/** Calibration probe for the bench's pinned host references
  * ([[graft.Bench.ControlRefSec]], [[graft.Bench.McControlRefSec]],
  * [[graft.Bench.DiskRefMbps]]): prints several samples of each fixed
  * control on the current host. Run on a QUIET machine; the best
  * across a quiet session is the reference each bench factor divides
  * by (BENCH_NOTES.md rounds 8/10 record the calibrations).
  */
object HostControlProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val n = if (args.nonEmpty) args(0).toInt else 5
    for (i <- 1 to n) {
      val s = graft.Bench.cpuControl(reps = 1)
      val m = graft.Bench.mcControl(reps = 1)
      val d = graft.Bench.diskProbe(sys.env.getOrElse("SPARK_GRAFT_BENCH_DISKDIR", "."))
      println(f"sample $i: ctl $s%.4f s, mc(32) $m%.4f s, disk $d%.0f MB/s")
    }
    println(f"best of a 3-rep ctl call (the bench's sampling): " +
      f"${graft.Bench.cpuControl()}%.4f s")
    println(f"best of a 2-rep mc call (the bench's sampling): " +
      f"${graft.Bench.mcControl()}%.4f s")
    println(f"pinned ControlRefSec:   ${graft.Bench.ControlRefSec}%.3f s")
    println(f"pinned McControlRefSec: ${graft.Bench.McControlRefSec}%.3f s")
    println(f"pinned DiskRefMbps:     ${graft.Bench.DiskRefMbps}%.0f MB/s")
  }
}
