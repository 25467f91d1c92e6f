package graft.store

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.Metric
import graft.functions.Distances

class ColdTierSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def mkVecs(n: Int, dim: Int, seed: Long, tsBase: Long) = {
    import spark.implicits._
    val rnd = new java.util.Random(seed)
    (0 until n).map(i => (tsBase + i, Array.fill(dim)(rnd.nextGaussian().toFloat),
      tsBase + i)).toDF("id", "vec", "eventTime")
  }

  test("seal/catalog/search: lossless skip (factor=1.0) equals brute force") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = Files.createTempDirectory("coldtier").toString
    // three time-disjoint segments
    val s1 = mkVecs(300, 8, 1L, 0L)
    val s2 = mkVecs(300, 8, 2L, 1000L)
    val s3 = mkVecs(300, 8, 3L, 2000L)
    ColdTier.seal(s1, dir, 1L)
    ColdTier.seal(s2, dir, 2L)
    ColdTier.seal(s3, dir, 3L)
    assert(ColdTier.catalog(spark, dir).length == 3)

    val all = s1.unionAll(s2).unionAll(s3).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getLong(2)))
    val qv = all(42)._2
    val queries = Seq((7L, qv, 5000L, 100000L)).toDF("qid", "qv", "qtime", "ttl")

    val got = ColdTier.search(spark, dir, queries, 10, Metric.L2,
      firstWaveFraction = 0.34, terminationFactor = 1.0)
      .collect().sortBy(_.getInt(1)).map(_.getLong(2))
    val want = all.map { case (id, v, _) => (id, Distances.l2(qv, v)) }
      .sortBy { case (id, d) => (d, id) }.take(10).map(_._1)
    assert(got.sameElements(want))
  }

  test("freshness pruning skips time-disjoint segments; eviction drops them") {
    import spark.implicits._
    val dir = Files.createTempDirectory("coldtier2").toString
    ColdTier.seal(mkVecs(200, 8, 4L, 0L), dir, 1L)
    ColdTier.seal(mkVecs(200, 8, 5L, 10000L), dir, 2L)
    val qv = Array.fill(8)(0f)
    // ttl window only covers the second segment
    val queries = Seq((1L, qv, 10100L, 200L)).toDF("qid", "qv", "qtime", "ttl")
    val got = ColdTier.search(spark, dir, queries, 5, Metric.L2)
      .collect().map(_.getLong(2))
    assert(got.nonEmpty && got.forall(_ >= 10000L))
    // evict everything older than ts 5000 -> one segment left
    val kept = ColdTier.evict(spark, dir, 5000L)
    assert(kept.map(_.segmentId).toList == List(2L))
    assert(ColdTier.catalog(spark, dir).length == 1)
  }
}
