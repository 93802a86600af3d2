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

  /** "lo-hi" (the taskset range the parent pinned this JVM to) → cpu set.
    * The child cannot derive this itself: under taskset,
    * `Runtime.availableProcessors` returns the PINNED count, not the
    * box's cpu indices.
    */
  def parseCpuRange(s: String): Option[Set[Int]] =
    s.split("-") match {
      case Array(lo, hi) if lo.forall(_.isDigit) && hi.forall(_.isDigit) =>
        Some((lo.toInt to hi.toInt).toSet)
      case _ => None
    }

  def arm(cpus: Int, frontierN: Long): Double = {
    val spark = Bench.session(cpus.toString)
    spark.sparkContext.setLogLevel("WARN")
    // warmup at FULL size: the first full-size run pays heap expansion,
    // page-fault and JIT-tier costs (measured 5× the steady state).
    // Forced through the noop sink — a bare count() would let Catalyst
    // prune the politeness windows and time a smaller job (Bench.force).
    Bench.force(Bench.frontierJob(spark, frontierN))
    spark.catalog.clearCache() // each timed run starts cold — no reuse
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_ARM_RUNS", "3").toInt
    // Per-run noise bracketing (r4): each TIMED RUN reads /proc/stat
    // around itself and self-reports steal + off-arm busy fractions. The
    // parent's whole-child bracket spans warmup + every run (~5 min on
    // the 1-core arm) — one host burst anywhere in that window used to
    // poison all of the child's runs; a ~70 s run-level bracket lets the
    // quiet runs inside a partially-noisy child still count.
    val armCpus = sys.env.get("SPARK_GRAFT_ARM_CPUSET").flatMap(parseCpuRange)
    val secs = (1 to nRuns).map { i =>
      val before = Bench.readCpuJiffies()
      val (_, s) = Bench.timed(Bench.force(Bench.frontierJob(spark, frontierN)))
      val after = Bench.readCpuJiffies()
      spark.catalog.clearCache()
      val (steal, offBusy) = (before, after, armCpus) match {
        case (Some(b), Some(a), Some(set)) => Bench.cpuNoise(b, a, set)
        case _ => (None, None)
      }
      def d(o: Option[Double]) = o.map(v => f"$v%.4f").getOrElse("null")
      println(f"""{"metric":"scaling_run","cpus":$cpus,"run":$i,"sec":$s%.3f,""" +
        s""""steal_frac":${d(steal)},"offarm_busy_frac":${d(offBusy)}}""")
      s
    }
    spark.stop()
    secs.min // best-of-n: drops residual JIT/GC noise
  }

  def main(args: Array[String]): Unit = {
    val nSmall = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE_CPUS", "8").toInt
    val nLarge = nSmall * 4
    val frontierN = sys.env.getOrElse("SPARK_GRAFT_FRONTIER_N", "8000000").toLong

    // single-arm mode: run one parallelism level in a dedicated JVM (the
    // two-arm-in-one-JVM mode makes the second arm inherit the first's
    // heap garbage; separate invocations measure clean)
    sys.env.get("SPARK_GRAFT_ARM").foreach { a =>
      val cpus = a.toInt
      val sec = arm(cpus, frontierN)
      println(f"""{"metric":"scaling_arm","cpus":$cpus,"sec":$sec%.2f,"frontier_n":$frontierN,"urls_per_sec":${(frontierN / sec).toLong}}""")
      return
    }

    val tSmall = arm(nSmall, frontierN)
    val tLarge = arm(nLarge, frontierN)
    val thrSmall = frontierN / tSmall
    val thrLarge = frontierN / tLarge
    val efficiency = (thrLarge / thrSmall) / (nLarge.toDouble / nSmall)
    println(f"""{"metric":"scaling_efficiency","value":$efficiency%.3f,"unit":"ratio","frontier_n":$frontierN,"cpus_small":$nSmall,"cpus_large":$nLarge,"sec_small":$tSmall%.2f,"sec_large":$tLarge%.2f,"urls_per_sec_small":${thrSmall.toLong},"urls_per_sec_large":${thrLarge.toLong}}""")
  }
}
