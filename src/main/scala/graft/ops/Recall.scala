package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Recall / latency evaluation (reference C8: SearchResult.getAccuracy
 * 192-201, StreamSearchLocalAccuracyTest.java — recall@k = |result ids
 * intersect ground-truth ids| / k, latency = completion - query event
 * time).
 */
object Recall {

  /** Per-query recall@k of ranked results vs ranked truth.
   * Both inputs: (qid, rn, id) rows; truth rows beyond k are ignored. */
  def atK(results: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    val r = results.where(col("rn") <= k)
      .groupBy("qid").agg(collect_set(col("id")).as("got"))
    val t = truth.where(col("rn") <= k)
      .groupBy("qid").agg(collect_set(col("id")).as("want"))
    r.join(t, "qid")
      .select(col("qid"),
        (size(array_intersect(col("got"), col("want"))).cast("double") / k)
          .as("recall"))
  }

  /** Mean recall@k (single row). */
  def meanAtK(results: DataFrame, truth: DataFrame, k: Int): Double =
    atK(results, truth, k).agg(avg("recall")).collect()(0).getDouble(0)

  /** Latency stats over a per-result latency column —
   * [[graft.streaming.VectorStreamJob.mergePartials]] emits `latency_ms`
   * (merge stamp − routing stamp, the reference's searchCompleteTime −
   * queryEventTime). One row per query (latency repeats per rank). */
  def latency(results: DataFrame, latencyCol: String = "latency_ms"): DataFrame =
    results.groupBy("qid").agg(max(col(latencyCol)).as("latency"))
      .agg(
        expr("percentile(latency, 0.5)").as("p50"),
        expr("percentile(latency, 0.99)").as("p99"),
        avg("latency").as("mean"),
        count(lit(1)).as("n"))
}
