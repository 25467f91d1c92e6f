package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    def check(name: String): Unit = {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      // collect() THIS frame: an action on a derived frame (count) would
      // execute a different physical plan, leaving this one un-finalized
      // under AQE (isFinalPlan=false, no codegen collapse applied)
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
      def has(t: String) = s.contains(t)
      println(s"== $name: pushedFilters=${has("PushedFilters: [")} " +
        s"broadcast=${has("BroadcastHashJoin") || has("BroadcastNestedLoopJoin")} " +
        s"wscg=$wscg " +
        s"sortMerge=${has("SortMergeJoin")} objHashAgg=${has("ObjectHashAggregate")}")
      // show scan lines (pruning evidence)
      s.linesIterator.filter(l => l.contains("ReadSchema") || l.contains("PushedFilters"))
        .take(3).foreach(l => println("   " + l.trim.take(160)))
    }
    Seq("q1_pricing_summary", "q3_revenue_by_nation", "q6_window_topn",
      "q11_interval_join", "knn_l2", "knn_ttl", "text_jaccard_pairs",
      "dedup_minhash", "knn_coldtier", "ann_sfc_adaptive",
      "embed_neardup_lsh", "text_decontaminate", "text_sample_stratified",
      "knn_join", "ann_ivf_pq", "ann_ivf_pq_rerank", "dedup_semantic",
      "text_repetition", "text_stopwords", "ann_sq8", "ann_sq8_rerank",
      "dedup_clusters", "text_dedup_lines", "text_pii",
      "text_filter_gopher", "text_mix_langs", "text_pack_sequences",
      "knn_coldtier_sq", "ann_ivf_sq8", "ann_mrl_rerank",
      "ann_bq_rerank", "search_docs", "eval_mrr",
      "search_hybrid_rrf").foreach(check)
    spark.stop()
  }
}
