package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval join: the completed two-stream run must equal
 * the batch join with the same condition, matches must respect the
 * [lts, lts + maxDelay] range, and out-of-order arrival inside the
 * lateness window must not lose pairs. */
class StreamJoinsSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("completed stream-stream interval join equals the batch join") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val lIn = MemoryStream[(Long, java.sql.Timestamp)]
    val rIn = MemoryStream[(Long, java.sql.Timestamp)]
    val l = lIn.toDF().toDF("lkey", "lts")
    val r = rIn.toDF().toDF("rkey", "rts")

    // key 1: right at +30s (in range) and +700s (out of 10-min range);
    // key 2: right BEFORE left (out of range);
    // key 3: no right at all; key 4 arrives out of order across batches
    val lRows = Seq((1L, ts(100)), (2L, ts(500)), (3L, ts(900)),
      (4L, ts(1200)))
    val rRows1 = Seq((1L, ts(130)), (1L, ts(800)), (2L, ts(450)))
    val rRows2 = Seq((4L, ts(1300)))

    val q = StreamJoins.interval(l, r, "10 minutes", "1 hour")
      .select(col("lkey"), col("lts"), col("rts"))
      .writeStream.format("memory").queryName("ssj_test")
      .outputMode("append").start()
    lIn.addData(lRows: _*)
    rIn.addData(rRows1: _*)
    q.processAllAvailable()
    rIn.addData(rRows2: _*) // late-arriving right side, inside lateness
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ssj_test").collect()
      .map(x => (x.getLong(0), x.getTimestamp(1).getTime / 1000,
        x.getTimestamp(2).getTime / 1000)).toSet

    val want = lRows.toDF("lkey", "lts")
      .join((rRows1 ++ rRows2).toDF("rkey", "rts"), expr(
        "lkey = rkey AND rts >= lts AND rts <= lts + INTERVAL 10 minutes"))
      .select(col("lkey"), col("lts"), col("rts"))
      .collect().map(x => (x.getLong(0), x.getTimestamp(1).getTime / 1000,
        x.getTimestamp(2).getTime / 1000)).toSet

    assert(got == want, s"got $got\nwant $want")
    assert(got == Set((1L, 100L, 130L), (4L, 1200L, 1300L)),
      "exactly the in-range pairs")
  }
}
