package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def mediaDf(n: Int) = {
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    (0 until n).map { i =>
      val rnd = new java.util.Random(i)
      val bytes = Array.fill(256 + i)(rnd.nextInt(256).toByte)
      (i.toLong, if (i % 2 == 0) "image" else "audio", bytes)
    }.toDF("id", "media_type", "media")
  }

  test("decode: schema, metadata, normalized features, batch shape") {
    val out = Multimodal.decode(mediaDf(10), batchSize = 3).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val meta = r.getStruct(2)
      assert(meta.getInt(1) >= 1 && meta.getInt(1) <= 4096) // width
      assert(meta.getInt(3) == (if (r.getString(1) == "image") 3 else 1)) // channels
      val feats = r.getSeq[Float](3)
      assert(feats.length == 16)
      assert(math.abs(feats.sum - 1.0f) < 1e-3) // histogram normalized
    }
  }

  test("frame sampling emits indexed slices") {
    val frames = Multimodal.sampleFrames(mediaDf(4), stride = 1).collect()
    assert(frames.nonEmpty)
    val byId = frames.groupBy(_.getLong(0))
    assert(byId(0L).map(_.getInt(1)).sorted.sameElements(0 until byId(0L).length))
    // every frame at most 64 bytes
    frames.foreach(f => assert(f.getAs[Array[Byte]](2).length <= 64))
  }

  test("resize: nearest-neighbor pixel mapping, fixed output dims, short-payload padding") {
    val out = Multimodal.resize(mediaDf(6), width = 8, height = 8).collect()
    assert(out.length == 6)
    out.foreach { r =>
      assert(r.getInt(1) == 8 && r.getInt(2) == 8)
      assert(r.getSeq[Int](3).length == 64)
      assert(r.getSeq[Int](3).forall(p => p >= 0 && p <= 255))
    }
    // exact mapping on a handmade payload: 128 bytes = 2 source rows of
    // 64; output row y maps to srcY = y*2/8 (rows 0-3 -> 0, 4-7 -> 1),
    // x maps to srcX = x*8
    val bytes = Array.tabulate(128)(i => (i % 251).toByte)
    val px = Multimodal.MediaCodec.resizeStub(bytes, 8, 8, 64)
    (0 until 8).foreach { y =>
      (0 until 8).foreach { x =>
        val srcIdx = (y * 2 / 8) * 64 + x * 8
        assert(px(y * 8 + x) == (bytes(srcIdx) & 0xff), s"($x,$y)")
      }
    }
    // payload shorter than one row: in-range bytes map, the rest pad 0
    val short = Multimodal.MediaCodec.resizeStub(Array[Byte](10, 20), 8, 8, 64)
    assert(short.count(_ != 0) == 8) // x=0 col maps to byte 0 -> 10; x=1.. pad
    assert((0 until 8).forall(y => short(y * 8) == 10))
  }

  test("feature top-k self-match ranks the query first") {
    val decoded = Multimodal.decode(mediaDf(20))
    val top = Multimodal.featureTopK(decoded, queryId = 6L, k = 3).collect()
    assert(top.head.getLong(0) == 6L && math.abs(top.head.getDouble(1)) < 1e-9)
  }
}
