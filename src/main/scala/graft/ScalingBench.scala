package graft

/** Scaling-efficiency evidence for the north rule ("throughput scaling
  * efficiency ≥ 0.8 from N to 4N executors").
  *
  * No real cluster exists in this sandbox, so the two cluster sizes are
  * evidenced as two parallelism levels of the SAME job on the SAME input:
  * local[N] vs local[4N] (default 8 → 32), fresh SparkSession per arm,
  * per-arm warmup run (codegen + JIT) before the timed run so JIT state
  * does not favor the second arm.
  *
  *   efficiency = (throughput_4N / throughput_N) / 4
  *
  * Prints one JSON line; results are recorded in BENCH.md / BASELINE.md.
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val nSmall = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE_CPUS", "8").toInt
    val nLarge = nSmall * 4
    val frontierN = sys.env.getOrElse("SPARK_GRAFT_FRONTIER_N", "8000000").toLong

    def arm(cpus: Int): Double = {
      val spark = Bench.session(cpus.toString)
      spark.sparkContext.setLogLevel("WARN")
      Bench.frontierJob(spark, frontierN / 8).count() // warmup
      val (_, sec) = Bench.timed(Bench.frontierJob(spark, frontierN).count())
      val (_, sec2) = Bench.timed(Bench.frontierJob(spark, frontierN).count())
      spark.stop()
      math.min(sec, sec2) // best-of-2: drops residual warmup noise
    }

    val tSmall = arm(nSmall)
    val tLarge = arm(nLarge)
    val thrSmall = frontierN / tSmall
    val thrLarge = frontierN / tLarge
    val efficiency = (thrLarge / thrSmall) / (nLarge.toDouble / nSmall)
    println(f"""{"metric":"scaling_efficiency","value":$efficiency%.3f,"unit":"ratio","frontier_n":$frontierN,"cpus_small":$nSmall,"cpus_large":$nLarge,"sec_small":$tSmall%.2f,"sec_large":$tLarge%.2f,"urls_per_sec_small":${thrSmall.toLong},"urls_per_sec_large":${thrLarge.toLong}}""")
  }
}
