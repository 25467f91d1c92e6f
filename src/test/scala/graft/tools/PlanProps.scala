package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Finalized-physical-plan property extraction shared by the PlanCheck
 * dev tool and the PlanCheckSpec assertion gate. AQE trap: a plan only
 * finalizes when THAT frame executes, so the frame itself is collected
 * and AdaptiveSparkPlanExec unwrapped. */
object PlanProps {
  final case class Props(pushedFilters: Boolean, broadcast: Boolean,
      wscg: Boolean, sortMerge: Boolean, objHashAgg: Boolean)

  def of(df: DataFrame): Props = {
    df.collect()
    def fin(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => fin(a.executedPlan)
      case other => other
    }
    val plan = fin(df.queryExecution.executedPlan)
    val s = plan.toString
    // the final tree string renders THROUGH AQE query-stage wrappers
    // (node traversal stops at them); "*(n)" is the codegen-span marker
    val wscg = s.contains("*(") ||
      plan.collect { case w: WholeStageCodegenExec => w }.nonEmpty
    Props(
      pushedFilters = s.contains("PushedFilters: ["),
      broadcast = s.contains("BroadcastHashJoin") ||
        s.contains("BroadcastNestedLoopJoin"),
      wscg = wscg,
      sortMerge = s.contains("SortMergeJoin"),
      objHashAgg = s.contains("ObjectHashAggregate"))
  }

  def of(spark: SparkSession, dir: String, name: String): Props =
    of(graft.SparkEntry.queries(name)(spark, dir))
}
