package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** O1 — partition-filter enforcement: the reference's table REQUIRES a
  * partition filter on every query (`require_partition_filter=true`,
  * /root/reference/deploy/create_bigquery_table.sql:31) so a careless scan
  * can never walk the whole history. Spark has no table-level equivalent
  * for plain parquet, so this is the engine-level guard: a Catalyst check
  * rule that rejects any analyzed plan scanning a `dt`-partitioned file
  * relation without a filter touching `dt` anywhere above the scan.
  *
  * Scoped by conf `spark.graft.requirePartitionFilter` (default off) so
  * maintenance reads (snapshot compaction, stats) can opt out explicitly —
  * the same escape hatch BigQuery offers via table settings.
  */
case class PartitionFilterCheck(spark: SparkSession)
    extends (LogicalPlan => Unit) {

  val ConfKey = "spark.graft.requirePartitionFilter"
  val PartitionCol = "dt"

  override def apply(plan: LogicalPlan): Unit = {
    if (!spark.conf.getOption(ConfKey).exists(_.toBoolean)) return
    check(plan, filtered = false)
  }

  private def check(plan: LogicalPlan, filtered: Boolean): Unit = plan match {
    case Filter(cond, child) =>
      val hits = cond.references.exists(_.name == PartitionCol)
      check(child, filtered || hits)
    case lr: LogicalRelation if (lr.relation match {
          case fs: HadoopFsRelation =>
            fs.partitionSchema.fieldNames.contains(PartitionCol)
          case _ => false
        }) =>
      if (!filtered)
        throw new IllegalStateException(
          s"scan of dt-partitioned relation ${lr.simpleString(50)} has no " +
            s"filter on '$PartitionCol' and $ConfKey=true " +
            "(reference semantics: require_partition_filter)")
    case other => other.children.foreach(check(_, filtered))
  }
}

/** Session-extension wiring: register with
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. Injects the
  * partition-filter check rule AND every native expression as a SQL
  * function ([[graft.functions.GraftFunctions]]), so spark-submit jobs
  * get `SELECT canonicalize_url(...)` et al. with zero session-side code.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectCheckRule(spark => PartitionFilterCheck(spark))
    graft.functions.GraftFunctions.all.foreach(extensions.injectFunction)
  }
}
