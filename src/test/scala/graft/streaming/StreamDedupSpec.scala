package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamDedup._

/** Streaming exact dedup: global-first semantics across batches, min-id
 * keeper within a batch, state bounded at 16 bytes per distinct doc. */
class StreamDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  test("first flags are global firsts; same-batch keeper is min doc_id") {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    val q = StreamDedup.run(input.toDS(), numShards = 8).writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[DedupVerdict], _: Long) =>
        batch.collect().foreach(v =>
          got.synchronized { got += ((v.docId, v.first)) })
      }.start()

    // batch 1: docs 0..9 distinct, plus 20/21 duplicating doc 1's text —
    // arrival order scrambled (keeper must be chosen by id, not order)
    val texts = (0 until 10).map(i => s"document body number $i with words")
    input.addData(
      (Seq(DocEvent(21L, texts(1)), DocEvent(20L, texts(1))) ++
        (0 until 10).map(i => DocEvent(i.toLong, texts(i)))).reverse: _*)
    q.processAllAvailable()
    val m1 = got.synchronized(got.toMap)
    assert((0 until 10).forall(i => m1(i.toLong)))
    assert(!m1(20L) && !m1(21L), "same-batch dups of doc 1 (id > 1) are not first")

    // batch 2: doc 30 repeats text 5 (cross-batch dup), doc 31 is new
    got.synchronized(got.clear())
    input.addData(DocEvent(30L, texts(5)), DocEvent(31L, "a brand new body"))
    q.processAllAvailable()
    val m2 = got.synchronized(got.toMap)
    assert(!m2(30L), "cross-batch duplicate must not be first")
    assert(m2(31L))

    // batch 3: the text of a batch-1 LOSER (id 20) is still a dup — the
    // state stores the hash regardless of which id kept it
    got.synchronized(got.clear())
    input.addData(DocEvent(40L, texts(1)))
    q.processAllAvailable()
    assert(!got.synchronized(got.toMap).apply(40L))
    q.stop()
  }

  test("contentHash collides only on equal text; merge keeps sorted order") {
    val hs = (0 until 1000).map(i => contentHash(s"text $i")).toSet
    assert(hs.size == 1000)
    assert(contentHash("same") == contentHash("same"))
  }

  test("exact dedup state survives a checkpointed stop/restart") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sd-ckpt").toString
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    def start() = StreamDedup.run(input.toDS(), numShards = 4).writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[DedupVerdict], _: Long) =>
        batch.collect().foreach(v =>
          got.synchronized { got += ((v.docId, v.first)) })
      }.start()
    val q1 = start()
    input.addData(DocEvent(1L, "alpha body"), DocEvent(2L, "beta body"))
    q1.processAllAvailable()
    q1.stop()
    val q2 = start()
    got.synchronized(got.clear())
    input.addData(DocEvent(10L, "alpha body"), DocEvent(11L, "gamma body"))
    q2.processAllAvailable()
    val m = got.synchronized(got.toMap)
    assert(!m(10L), "pre-restart text must still be a duplicate after recovery")
    assert(m(11L))
    q2.stop()
  }

  test("near-dup verdicts match a brute-force simhash replay") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[DocEvent]
    val got = scala.collection.mutable.Map.empty[Long, (Boolean, Long, Int)]
    val q = StreamDedup.runNear(input.toDS(), maxHamming = 3) { df =>
      df.collect().foreach(r => got.synchronized {
        got(r.getLong(0)) = (r.getBoolean(2), r.getLong(3), r.getInt(4)) })
    }
    // corpus: distinct bases + exact repeats + one-token tweaks (some land
    // within Hamming 3, some don't — the replay decides, not the fixture)
    val texts = scala.collection.mutable.LinkedHashMap.empty[Long, String]
    (0 until 12).foreach(i => texts(i.toLong) =
      s"streaming corpus document number $i with a long body of shared words and filler token$i")
    texts(20L) = texts(3L) // exact repeat
    texts(21L) = texts(5L).replace("filler", "patched")
    texts(22L) = texts(7L) + " tail"
    // feed in two batches
    val (b1, b2) = texts.toSeq.splitAt(9)
    input.addData(b1.map { case (id, t) => DocEvent(id, t) }: _*)
    q.processAllAvailable()
    input.addData(b2.map { case (id, t) => DocEvent(id, t) }: _*)
    q.processAllAvailable()
    q.stop()
    // brute-force replay: earlier = earlier batch, or same batch + lower id
    val order = b1.map(_._1) ++ b2.map(_._1)
    val batchOf = (b1.map(_._1 -> 0) ++ b2.map(_._1 -> 1)).toMap
    val sh = texts.map { case (id, t) => id -> graft.functions.Text.simhash(t) }
    var sawDup = false
    order.foreach { id =>
      val earlier = order.filter(o =>
        batchOf(o) < batchOf(id) || (batchOf(o) == batchOf(id) && o < id))
      val cands = earlier.map(o => (java.lang.Long.bitCount(sh(id) ^ sh(o)), o))
        .filter(_._1 <= 3)
      val (wantDup, wantOf, wantHam) =
        if (cands.isEmpty) (false, -1L, -1)
        else { val (h, o) = cands.min; (true, o, h) }
      val (gd, go, gh) = got.synchronized(got(id))
      assert((gd, go, gh) == ((wantDup, wantOf, wantHam)), s"doc $id")
      sawDup ||= wantDup
    }
    assert(sawDup, "fixture must contain at least one near-dup")
  }
}
