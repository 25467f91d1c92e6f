package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Metric, SparkEntry}
import graft.ops.Ann

/** Ann.bruteForce (per-partition bounded-heap kernel) must be bit-equal
 * to the oracle-gated broadcast-join formulation — same sequential-double
 * distances, same (dist, id) tie-break, same freshness semantics. */
class BruteForceSpec extends AnyFunSuite {
  private lazy val spark = SparkEntry.configure(SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  private def corpus = Tables(spark, dir, "embeddings")
    .select(col("vec_id").as("id"), col("embedding").as("vec"),
      col("vec_id").as("eventTime"))

  private def queries(qtimeFromQid: Boolean) = {
    val q = Tables(spark, dir, "embeddings")
      .where(col("vec_id") % VectorQueries.QueryMod === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    if (qtimeFromQid)
      q.select(col("qid"), col("qv"), col("qid").as("qtime"),
        lit(VectorQueries.Ttl).as("ttl"))
    else
      q.select(col("qid"), col("qv"), lit(Long.MaxValue / 2).as("qtime"),
        lit(Long.MaxValue / 2).as("ttl"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getDouble(3))).toSet

  test("bruteForce == gated knn_l2 bit-exact") {
    spark.sparkContext.setLogLevel("ERROR")
    val got = rows(Ann.bruteForce(corpus, queries(qtimeFromQid = false),
      VectorQueries.K, Metric.L2))
    val want = rows(VectorQueries.queries("knn_l2")(spark, dir))
    assert(got == want)
  }

  test("bruteForce freshness window == gated knn_ttl bit-exact") {
    val got = rows(Ann.bruteForce(corpus, queries(qtimeFromQid = true),
      VectorQueries.K, Metric.L2))
    val want = rows(VectorQueries.queries("knn_ttl")(spark, dir))
    assert(got == want)
  }

  test("bruteForce cosine == gated knn_cosine bit-exact") {
    val got = rows(Ann.bruteForce(corpus, queries(qtimeFromQid = false),
      VectorQueries.K, Metric.Cosine))
    val want = rows(VectorQueries.queries("knn_cosine")(spark, dir))
    assert(got == want)
  }

  test("knn_sql (topk_merge SQL surface) == gated knn_l2 bit-exact") {
    val got = rows(VectorQueries.queries("knn_sql")(spark, dir))
    val want = rows(VectorQueries.queries("knn_l2")(spark, dir))
    assert(got == want)
  }
}
