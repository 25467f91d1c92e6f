package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** Connected components (min-label propagation) — the dedup
 * cluster-selection step. Components must be exact on chains (worst-case
 * diameter for the round count), cliques (the common near-dup shape),
 * and disjoint unions thereof. */
class DedupCcSpec extends AnyFunSuite {
  private lazy val spark = SparkEntry.configure(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val df = Dedup.connectedComponents(pairs.toDF("i", "j"))
    val out = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    df.unpersist()
    out
  }

  test("clique + chain + isolated pair resolve to min-id components") {
    spark.sparkContext.setLogLevel("ERROR")
    val clique = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val pair = Seq((100L, 101L))
    val got = cc(clique ++ chain ++ pair)
    assert((1L to 4L).forall(got(_) == 1L))
    assert((10L to 13L).forall(got(_) == 10L))
    assert(got(100L) == 100L && got(101L) == 100L)
    assert(got.size == 10)
  }

  test("long chain converges (diameter rounds, not one)") {
    val n = 18L
    val chain = (1L until n).map(i => (i, i + 1))
    val got = cc(chain)
    assert((1L to n).forall(got(_) == 1L))
  }

  test("edge order and direction don't matter") {
    val a = cc(Seq((5L, 9L), (9L, 7L)))
    val b = cc(Seq((7L, 9L), (9L, 5L)))
    assert(a == b && a(7L) == 5L)
  }
}
