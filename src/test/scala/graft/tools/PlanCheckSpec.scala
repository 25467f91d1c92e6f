package graft.tools

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * The plan audit as a FAILING gate (round-6 advice #7): PlanCheck printed
 * broadcast/wscg/pushdown booleans but a regression — like round 5's
 * eval_mrr sort-merge fallback on two tiny windowed inputs — only
 * surfaced if someone read the output. Every audited entry now asserts
 * the plan properties its scale story depends on:
 *
 *  - `wscg`: the hot path stays inside whole-stage codegen;
 *  - `noSortMerge`: every join the entry performs against a small side is
 *    broadcast (sort-merge of a tiny input = a lost size estimate). The
 *    one legitimate sort-merge is search_hybrid_rrf's posting join — its
 *    probe side is corpus-sized, shuffling is the correct plan;
 *  - `broadcast`: entries whose plan must contain a broadcast join;
 *  - `pushedFilters`: the parquet scan receives pushed predicates
 *    (dedup_clusters exempt: it reads the whole pair aux by design).
 */
class PlanCheckSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkEntry.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  /** (entry, requireBroadcast, requirePushedFilters, allowSortMerge) —
   * wscg is required for every entry. */
  private val expectations: Seq[(String, Boolean, Boolean, Boolean)] = Seq(
    ("q1_pricing_summary", false, true, false),
    ("q3_revenue_by_nation", true, true, false),
    ("q6_window_topn", false, true, false),
    ("q11_interval_join", true, true, false),
    ("knn_l2", true, true, false),
    ("knn_ttl", true, true, false),
    ("text_jaccard_pairs", true, true, false),
    ("dedup_minhash", true, true, false),
    ("knn_coldtier", true, true, false),
    ("knn_coldtier_compacted", true, true, false),
    ("knn_coldtier_deletes", true, true, false),
    ("knn_coldtier_sq", true, true, false),
    ("knn_coldtier_hnsw", true, true, false),
    ("knn_coldtier_hnsw_sharded", true, true, false),
    ("ann_sfc_adaptive", false, true, false),
    ("embed_neardup", false, true, false),
    ("embed_neardup_lsh", true, true, false),
    ("text_decontaminate", true, true, false),
    ("text_sample_stratified", false, true, false),
    ("knn_join", false, true, false),
    ("ann_ivf_pq", true, true, false),
    ("ann_ivf_pq_rerank", true, true, false),
    ("dedup_semantic", true, true, false),
    ("text_repetition", true, true, false),
    ("text_stopwords", true, true, false),
    ("ann_sq8", false, true, false),
    ("ann_sq8_rerank", true, true, false),
    ("dedup_clusters", false, false, false),
    ("text_dedup_lines", true, true, false),
    ("text_pii", false, true, false),
    ("text_filter_gopher", true, true, false),
    ("text_mix_langs", true, true, false),
    ("text_pack_sequences", false, true, false),
    ("ann_ivf_sq8", true, true, false),
    ("ann_mrl_rerank", true, true, false),
    ("ann_bq_rerank", true, true, false),
    ("search_docs", true, true, false),
    ("eval_mrr", true, true, false),
    // the posting join now broadcasts the budgeted query-term set (the
    // windowed sub-plan defeated size estimation; sort-merge shuffled the
    // whole tf table on a 31-distinct-key column = maximal skew), so NO
    // audited entry has a legitimate sort-merge left
    ("search_hybrid_rrf", true, true, false),
    ("knn_range", true, true, false),
    // single-table windowed sessionization: one hash exchange on user_id,
    // no join at all
    ("q10_sessionize", false, true, false),
    // the composed curation pipeline: all stage joins are doc_id-keyed
    // broadcasts at this scale (at corpus scale AQE may shuffle them —
    // same keys, still no silent regression to audit for); at sf0.001 the
    // entry returns ZERO rows and AQE collapses the whole plan to
    // EmptyRelation (nothing to audit), hence the sf0.01 override below
    ("pipeline_curate", true, true, false))

  /** Entries whose plan only materializes at a larger scale factor. */
  private val dirOverride: Map[String, String] =
    Map("pipeline_curate" -> "/root/testdata/sf0.01")

  test("every audited entry keeps its expected physical-plan shape") {
    spark.sparkContext.setLogLevel("ERROR")
    val failures = expectations.flatMap {
      case (name, wantBroadcast, wantPushed, allowSortMerge) =>
        val p = PlanProps.of(spark, dirOverride.getOrElse(name, dir), name)
        val errs = Seq(
          (!p.wscg) -> "no WholeStageCodegen span",
          (wantBroadcast && !p.broadcast) -> "expected broadcast join missing",
          (wantPushed && !p.pushedFilters) -> "no PushedFilters on the scan",
          (!allowSortMerge && p.sortMerge) ->
            "sort-merge join appeared (lost a broadcast?)"
        ).collect { case (true, msg) => s"$name: $msg ($p)" }
        errs
    }
    assert(failures.isEmpty, failures.mkString("\n", "\n", ""))
  }
}
