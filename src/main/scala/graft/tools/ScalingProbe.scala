package graft.tools

/** Standalone driver for the scaling-arm machinery: runs exactly the
  * N→4N pinned-child protocol the full bench runs (adaptive rounds,
  * per-run noise telemetry, self-adjudicated validity) and prints the
  * same `"scaling"` JSON object — without the 50-query suite in front of
  * it. For iterating on the scaling record (protocol changes, noise-bound
  * tuning, quick box-health checks) at a turnaround of minutes instead of
  * the bench's full wall time.
  *
  *   SPARK_GRAFT_FRONTIER_N=2000000 sbt -batch "runMain graft.tools.ScalingProbe"
  *
  * Arm cores default to 1→4 (the north-rule pair); pass two args to
  * probe another pair, e.g. `runMain graft.tools.ScalingProbe 4 16`
  * for the round-5 driver-parallelism evidence arm.
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_FRONTIER_N", "8000000").toLong
    val cores =
      if (args.length >= 2) Seq(args(0).toInt, args(1).toInt) else Seq(1, 4)
    val json = graft.Bench.scalingRecord(cores, n)
    println(json)
  }
}
