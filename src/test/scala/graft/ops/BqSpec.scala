package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkEntry

/** Binary quantization: bit packing, the codegen Hamming column vs a
 * hand computation, and reranked recall on the fixture embeddings. */
class BqSpec extends AnyFunSuite {
  private lazy val spark = SparkEntry.configure(SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  test("encode packs sign bits against per-dim thresholds") {
    val m = Bq.BqModel(Array(0.0, 0.0, 1.0, -1.0))
    // dims: >0, <=0, >1, >-1  ->  bits 0,_,_,3
    val code = m.encode(Array(0.5f, -0.5f, 0.5f, 0f))
    assert(code.length == 1 && code(0) == ((1L << 0) | (1L << 3)))
    // 70-dim model spills into a second word
    val m2 = Bq.fit(Array(Array.fill(70)(0f), Array.fill(70)(2f)))
    val c2 = m2.encode(Array.fill(70)(3f))
    assert(c2.length == 2 && c2(0) == -1L && c2(1) == (1L << 6) - 1)
  }

  test("hamming column matches Long.bitCount over xors") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val rnd = new java.util.Random(5L)
    val rows = Seq.fill(50)((Array.fill(2)(rnd.nextLong()), Array.fill(2)(rnd.nextLong())))
    val got = rows.toDF("a", "b")
      .select(Bq.hamming(org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")))
      .collect().map(_.getLong(0))
    val want = rows.map { case (a, b) =>
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum }
    assert(got.toSeq == want)
  }

  test("bq rerank recall vs exact is reported and nontrivial") {
    spark.sparkContext.setLogLevel("ERROR")
    val exact = graft.queries.VectorQueries.queries("knn_l2")(spark, dir)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val got = graft.queries.PqQueries.queries("ann_bq_rerank")(spark, dir)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val rs = exact.toSeq.map { case (q, t) =>
      got.getOrElse(q, Set.empty).count(t.contains).toDouble / t.size }
    val r = rs.sum / rs.size
    info(s"bq rerank recall@10 = $r")
    // 1 bit/dim at dim 64 over untuned synthetic embeddings; the wide
    // shortlist + exact re-rank must still recover a solid majority
    assert(r >= 0.5, s"bq recall $r")
  }
}
