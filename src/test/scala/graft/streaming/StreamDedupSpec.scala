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
}
