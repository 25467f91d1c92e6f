package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: print the finalized-plan properties + scan lines for the
 * audited entries. The ASSERTION gate lives in [[PlanCheckSpec]] (runs in
 * `sbt test`); this main is for eyeballing scan pruning evidence. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    def check(name: String): Unit = {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val p = PlanProps.of(df)
      println(s"== $name: pushedFilters=${p.pushedFilters} " +
        s"broadcast=${p.broadcast} wscg=${p.wscg} " +
        s"sortMerge=${p.sortMerge} objHashAgg=${p.objHashAgg}")
      // show scan lines (pruning evidence)
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("ReadSchema") || l.contains("PushedFilters"))
        .take(3).foreach(l => println("   " + l.trim.take(160)))
    }
    val defaults = Seq("q1_pricing_summary", "q3_revenue_by_nation", "q6_window_topn",
      "q11_interval_join", "knn_l2", "knn_ttl", "text_jaccard_pairs",
      "dedup_minhash", "knn_coldtier", "knn_coldtier_compacted",
      "knn_coldtier_deletes", "ann_sfc_adaptive",
      "embed_neardup", "embed_neardup_lsh", "text_decontaminate",
      "text_sample_stratified", "knn_join", "ann_ivf_pq",
      "ann_ivf_pq_rerank", "dedup_semantic", "text_repetition",
      "text_stopwords", "ann_sq8", "ann_sq8_rerank", "dedup_clusters",
      "text_dedup_lines", "text_pii", "text_filter_gopher",
      "text_mix_langs", "text_pack_sequences", "knn_coldtier_sq",
      "knn_coldtier_hnsw", "ann_ivf_sq8", "ann_mrl_rerank",
      "ann_bq_rerank", "search_docs", "eval_mrr",
      "search_hybrid_rrf")
    (if (args.nonEmpty) args.toSeq else defaults).foreach(check)
    spark.stop()
  }
}
