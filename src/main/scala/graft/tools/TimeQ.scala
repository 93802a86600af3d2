package graft.tools

/** Time one `SparkEntry.queries` entry standalone, N times, through the
  * noop sink — the single-query probe behind bench triage (run 1 is cold
  * codegen/caches, later runs are warm):
  * {{{ sbt -batch "runMain graft.tools.TimeQ q_doc_lsh_pairs [sfDir] [runs]" }}}
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = graft.Bench.session("32")
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[timeq] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
