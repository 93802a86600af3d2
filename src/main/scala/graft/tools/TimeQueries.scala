package graft.tools

import graft.{Bench, SparkEntry}

/** Times a named subset of SparkEntry.queries (all, if none given) at the
  * Bench session settings — the fast feedback loop for per-query tuning
  * without paying the full frontier headline.
  *
  * Usage: runMain graft.tools.TimeQueries <sfDir> [query ...]
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val (rows, sec) = Bench.timed(fn(spark, sfDir).count())
      spark.catalog.clearCache()
      println(f"$n%-32s $sec%8.2fs  $rows%d rows")
    }
    spark.stop()
  }
}
