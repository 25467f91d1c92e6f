package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.Metric
import graft.functions.Distances
import graft.partitioners.SimplePartitioner

/** The routed kNN join against an in-test exact reference, under a
 * broadcast-to-all partitioner (SimplePartitioner routes queries to
 * every partition, so the candidate set is the whole corpus and the
 * join must equal the global non-self kNN). The tests pin BOTH branches
 * of the adaptive per-cell scan kernel to the same exact truth, not
 * just to each other: the broadcast query side makes per-cell queries
 * outnumber rows (query-outer), and one test drives searchRouted with a
 * query subset smaller than the per-cell row count (row-outer). */
class KnnJoinSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkEntry.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()

  private val dim = 8
  private def corpus(n: Int, tsOf: Int => Long): Seq[(Long, Array[Float], Long)] =
    (0 until n).map { i =>
      val rnd = new java.util.Random(500L + i)
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat), tsOf(i))
    }

  /** exact non-self kNN with a per-query window [ts_q - w, ts_q]. */
  private def reference(rows: Seq[(Long, Array[Float], Long)], k: Int,
      window: Option[Long]): Map[Long, Seq[(Long, Double)]] =
    rows.map { case (qid, qv, qts) =>
      val (floor, ceil) = window match {
        case Some(w) => (qts - w, qts)
        case None => (Long.MinValue, Long.MaxValue)
      }
      qid -> rows
        .filter { case (id, _, ts) => id != qid && ts >= floor && ts <= ceil }
        .map { case (id, v, _) => (id, Distances.l2(qv, v)) }
        .sortBy { case (id, d) => (d, id) }.take(k)
    }.toMap.filter(_._2.nonEmpty) // a zero-candidate query emits no rows

  private def joined(rows: Seq[(Long, Array[Float], Long)], k: Int,
      parts: Int, window: Option[Long]): Map[Long, Seq[(Long, Double)]] = {
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val df = rows.toDF("id", "vec", "eventTime")
    Ann.knnJoin(df, k, SimplePartitioner(parts), Metric.L2,
        useHnsw = false, window = window)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rs) =>
        qid -> rs.sortBy(_.getInt(1) /* rn */)
          .map(r => (r.getLong(2), r.getDouble(3))).toSeq
      }
  }

  test("unbounded join equals global non-self kNN (query-outer branch: 1 partition, queries >> rows)") {
    val rows = corpus(300, i => i.toLong)
    assert(joined(rows, 5, parts = 1, window = None) ===
      reference(rows, 5, None))
  }

  test("unbounded join equals global non-self kNN (row-outer branch: rows outnumber per-partition queries)") {
    // 2 partitions: each holds ~150 rows; SimplePartitioner broadcasts
    // all 300 queries to both, so per-cell nq(300) > m(150) — still the
    // query-outer branch. Forcing row-outer needs nq <= m: dedupe the
    // query side by joining only a PREFIX of vectors as queries is not
    // the knnJoin contract, so row-outer is exercised through
    // searchRouted directly with a small query set.
    import spark.implicits._
    val rows = corpus(300, i => i.toLong)
    val model = SimplePartitioner(2)
    val (dr, qr0) = Ann.selfJoinRouting(rows.toDF("id", "vec", "eventTime"),
      model)
    val qr = qr0.filter(_.qid < 40) // 40 queries vs ~150 rows per cell
    val got = Ann.knnJoinRouted(dr, qr, 5, Metric.L2).collect()
      .groupBy(_.getLong(0))
      .map { case (qid, rs) => qid -> rs.sortBy(_.getInt(1))
        .map(r => (r.getLong(2), r.getDouble(3))).toSeq }
    val want = reference(rows, 5, None).filter(_._1 < 40)
    assert(got === want)
  }

  test("temporal join applies each vector's own window; self always survives to be dropped") {
    val rows = corpus(300, i => i.toLong)
    assert(joined(rows, 5, parts = 3, window = Some(60L)) ===
      reference(rows, 5, Some(60L)))
  }

  test("negative eventTimes are in-window for the unbounded join (r11 review regression)") {
    val rows = corpus(200, i => i.toLong - 100) // ts in [-100, 99]
    val got = joined(rows, 5, parts = 2, window = None)
    assert(got === reference(rows, 5, None))
    // a vector with a negative ts must appear as someone's neighbor
    val negIds = rows.filter(_._3 < 0).map(_._1).toSet
    assert(got.values.flatten.exists { case (id, _) => negIds(id) },
      "no negative-eventTime row surfaced as a neighbor")
  }
}
