package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Watermarked tumbling-window aggregation: the completed stream must
 * equal the batch twin, emission is append-only (immutable once out),
 * and rows later than the watermark horizon are dropped — the three
 * documented Structured Streaming properties the operator relies on. */
class EventWindowsSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()

  private val H = 3600L // seconds per hour

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("completed stream equals the batch twin; late row dropped") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val stream = input.toDF().toDF("ts", "event_type", "value")

    // batch 1: two hours of events, out of order inside the lateness
    val b1 = Seq(
      (ts(10), "click", 1.0), (ts(H + 20), "click", 2.0),
      (ts(30), "view", 3.0), (ts(5), "click", 0.5))
    // batch 2: advances event time to hour 4; the watermark COMPUTED
    // from it (4h10s - 1h = 3h10s) only takes effect in the NEXT batch
    // (the documented one-batch lag), closing hours 0..2 there
    val b2 = Seq((ts(4 * H + 10), "flush", 0.0))
    // batch 3: a too-late straggler for hour 0 — beyond the now-active
    // watermark, must be dropped, not folded into the closing window
    val late = (ts(40), "click", 99.0)

    val q = EventWindows.hourly(stream, "1 hour").writeStream
      .format("memory").queryName("ew_test").outputMode("append").start()
    input.addData(b1: _*)
    q.processAllAvailable()
    input.addData(b2: _*)
    q.processAllAvailable()
    input.addData(late, (ts(4 * H + 20), "flush", 0.0))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ew_test")
      .select("window_start", "event_type", "n", "sum_value").collect()
      .map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet

    // batch twin over b1 only — the late row was dropped and the flush
    // rows' hour-4 window never closed, so the emitted set must be
    // exactly the b1 aggregation
    val want = EventWindows.hourlyBatch(
        b1.toDF("ts", "event_type", "value"))
      .collect().map(r => (r.getTimestamp(0).getTime / 1000, r.getString(1),
        r.getLong(2), r.getDouble(3))).toSet
    assert(got == want, s"got $got\nwant $want")
    // sanity: the late row's value must not be folded anywhere
    assert(!got.exists(_._4 == 99.0) &&
      got.find(t => t._1 == 0 && t._2 == "click").get._3 == 2L)
  }

  test("windowed aggregation state survives a checkpointed stop/restart") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val stream = input.toDF().toDF("ts", "event_type", "value")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ew-ckpt").toString
    // the memory sink cannot recover from a checkpoint — foreachBatch can
    val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long, Double)]
    def start() = EventWindows.hourly(stream, "1 hour").writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.collect().foreach(r => emitted.synchronized {
          emitted += ((r.getTimestamp(0).getTime / 1000, r.getString(1),
            r.getLong(2), r.getDouble(3)))
        })
      }.start()

    // half of hour-0 before the stop, half after: the recovered state
    // must fold BOTH halves into the single emitted hour-0 row
    val q1 = start()
    input.addData((ts(10), "click", 1.0), (ts(20), "click", 2.0))
    q1.processAllAvailable()
    q1.stop()
    val q2 = start()
    input.addData((ts(30), "click", 4.0))
    q2.processAllAvailable()
    // advance watermark past hour 0 (one-batch lag -> two nudges)
    input.addData((ts(3 * H), "flush", 0.0))
    q2.processAllAvailable()
    input.addData((ts(3 * H + 10), "flush", 0.0))
    q2.processAllAvailable()
    q2.stop()

    val hour0 = emitted.synchronized(emitted.toSeq)
      .filter(_._2 == "click").map(t => (t._1, t._3, t._4))
    assert(hour0 == Seq((0L, 3L, 7.0)),
      s"recovered state must fold pre- and post-restart rows: $hour0")
  }

  test("stream-static enrichment equals the batch join, dim broadcast") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val dim = Seq(("click", 1.5), ("view", 0.2))
      .toDF("event_type", "weight")
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val stream = input.toDF().toDF("ts", "event_type", "value")

    val rows = Seq(
      (ts(10), "click", 1.0), (ts(20), "view", 2.0),
      (ts(30), "scroll", 3.0)) // no dim row -> left join keeps it

    val q = EventWindows.enrich(stream, dim)
      .select(col("ts"), col("event_type"), col("value"), col("weight"))
      .writeStream.format("memory").queryName("ew_enrich")
      .outputMode("append").start()
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ew_enrich").collect()
      .map(r => (r.getString(1), r.getDouble(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    val want = EventWindows.enrich(rows.toDF("ts", "event_type", "value"), dim)
      .select(col("ts"), col("event_type"), col("value"), col("weight"))
      .collect().map(r => (r.getString(1), r.getDouble(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
    assert(got == want && got.size == 3)
    assert(got.contains(("scroll", 3.0, None)), "unmatched type survives the left join")
  }
}
