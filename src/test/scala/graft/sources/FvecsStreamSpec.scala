package graft.sources

import java.nio.file.Files
import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** S1 as a true stream: directory tail, sequential id bases, admission
 * cap, tail-file growth, and checkpointed restart continuity. */
class FvecsStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def writeF(path: String, n: Int, dim: Int, seed: Long): Unit = {
    val rnd = new java.util.Random(seed)
    VectorFiles.write(path,
      Iterator.fill(n)(Array.fill(dim)(rnd.nextFloat())), VectorFiles.F32)
  }

  private def appendF(path: String, n: Int, dim: Int, seed: Long): Unit = {
    val rnd = new java.util.Random(seed)
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path, true)))
    try Iterator.fill(n)(Array.fill(dim)(rnd.nextFloat())).foreach { v =>
      val bb = java.nio.ByteBuffer.allocate(4 + v.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(v.length)
      v.foreach(bb.putFloat)
      out.write(bb.array())
    } finally out.close()
  }

  test("directory tail: new files, tail growth, dense sequential ids") {
    spark.sparkContext.setLogLevel("ERROR")
    val dir = Files.createTempDirectory("fvecs-stream").toString
    writeF(s"$dir/a.fvecs", 10, 4, 1L)
    val batches = mutable.ArrayBuffer.empty[Array[Long]]
    val q = FvecsStream.readStream(spark, dir).writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = df.collect().map(_.getLong(0)).sorted
        batches.synchronized { batches += ids }; ()
      }
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    q.processAllAvailable()
    assert(batches.flatten.sorted.sameElements(0L until 10L))

    writeF(s"$dir/b.fvecs", 5, 4, 2L) // new file: base = 10
    q.processAllAvailable()
    assert(batches.flatten.sorted.sameElements(0L until 15L))

    appendF(s"$dir/b.fvecs", 3, 4, 3L) // tail growth: ids 15..17
    q.processAllAvailable()
    assert(batches.flatten.sorted.sameElements(0L until 18L))
    q.stop()
  }

  test("maxRecordsPerTrigger bounds every micro-batch") {
    val dir = Files.createTempDirectory("fvecs-cap").toString
    writeF(s"$dir/a.fvecs", 23, 4, 4L)
    val sizes = mutable.ArrayBuffer.empty[Long]
    val q = FvecsStream.readStream(spark, dir, maxRecordsPerTrigger = Some(7L))
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = df.count(); sizes.synchronized { sizes += n }; ()
      }
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    assert(sizes.filter(_ > 0).forall(_ <= 7L), sizes.mkString(","))
    assert(sizes.sum == 23L)
  }

  test("restart from checkpoint keeps id bases and reads only new data") {
    val dir = Files.createTempDirectory("fvecs-restart").toString
    val ck = Files.createTempDirectory("ck").toString
    writeF(s"$dir/a.fvecs", 8, 4, 5L)
    val seen = mutable.ArrayBuffer.empty[Long]
    def start() = FvecsStream.readStream(spark, dir).writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = df.collect().map(_.getLong(0))
        seen.synchronized { seen ++= ids }; ()
      }
      .option("checkpointLocation", ck).start()
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    assert(seen.sorted.sameElements(0L until 8L))
    // a fresh stream instance (fresh FvecsMicroBatchStream) must restore
    // bases from the checkpoint, not re-derive them from a directory scan
    writeF(s"$dir/b.fvecs", 4, 4, 6L)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(seen.sorted.sameElements(0L until 12L), seen.sorted.mkString(","))
  }

  test("vectors round-trip bit-exactly through the stream") {
    val dir = Files.createTempDirectory("fvecs-exact").toString
    val rnd = new java.util.Random(7L)
    val vecs = Array.fill(32)(Array.fill(6)(rnd.nextFloat()))
    VectorFiles.write(s"$dir/a.fvecs", vecs.iterator, VectorFiles.F32)
    val got = mutable.ArrayBuffer.empty[(Long, Array[Float])]
    val q = FvecsStream.readStream(spark, dir, recordsPerSplit = 5)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        got.synchronized { got ++= rows }; ()
      }
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    q.processAllAvailable()
    q.stop()
    assert(got.length == 32)
    got.sortBy(_._1).zipWithIndex.foreach { case ((id, v), i) =>
      assert(id == i && v.sameElements(vecs(i)))
    }
  }
}
