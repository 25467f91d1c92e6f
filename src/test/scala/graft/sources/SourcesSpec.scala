package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def tmp(name: String): String =
    Files.createTempDirectory("graft").resolve(name).toString

  test("fvecs round-trip with multi-split parallel read") {
    spark.sparkContext.setLogLevel("ERROR")
    val path = tmp("a.fvecs")
    val rnd = new java.util.Random(1L)
    val vecs = Array.fill(1000)(Array.fill(8)(rnd.nextFloat()))
    VectorFiles.write(path, vecs.iterator, VectorFiles.F32)
    // force many small splits to exercise record-aligned range reads
    val df = VectorFiles.read(spark, path, VectorFiles.F32, recordsPerSplit = 64)
    val got = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)
    assert(got.length == 1000)
    assert(got.map(_._1).sameElements(0L until 1000L))
    got.foreach { case (id, v) => assert(v.sameElements(vecs(id.toInt))) }
  }

  test("bvecs reads unsigned bytes") {
    val path = tmp("b.bvecs")
    val vecs = Array(Array(0f, 127f, 128f, 255f), Array(1f, 2f, 3f, 4f))
    VectorFiles.write(path, vecs.iterator, VectorFiles.U8)
    val got = VectorFiles.read(spark, path, VectorFiles.U8).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    assert(got(0)._2.sameElements(Array(0f, 127f, 128f, 255f))) // 128/255 not sign-wrapped
    assert(got(1)._2.sameElements(Array(1f, 2f, 3f, 4f)))
  }

  test("ivecs ground truth reader") {
    val path = tmp("gt.ivecs")
    VectorFiles.write(path, Iterator(Array(5f, 3f, 9f), Array(1f, 2f, 0f)), VectorFiles.I32)
    val got = VectorFiles.readIvecs(spark, path).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).sortBy(_._1)
    assert(got(0)._2.sameElements(Array(5L, 3L, 9L)))
    assert(got(1)._2.sameElements(Array(1L, 2L, 0L)))
  }

  test("delete injection is deterministic and targets recent ids") {
    val path = tmp("c.fvecs")
    val vecs = Array.fill(2000)(Array.fill(4)(1f))
    VectorFiles.write(path, vecs.iterator, VectorFiles.F32)
    val df = VectorFiles.read(spark, path, VectorFiles.F32)
    val withDel = VectorFiles.withDeletes(df, 0.1, seed = 7L)
    val rows = withDel.collect()
    val dels = rows.filter(_.getBoolean(4))
    assert(dels.length > 100 && dels.length < 300, s"got ${dels.length} deletes")
    // every delete references an id emitted within the 1000 before it
    dels.foreach { r =>
      val delId = r.getLong(0)
      val pos = r.getLong(2) // eventTime = original position
      assert(delId >= pos - 1000 && delId < pos)
      assert(r.isNullAt(1)) // no vector payload
    }
    // deterministic
    val again = VectorFiles.withDeletes(df, 0.1, seed = 7L).collect()
    assert(again.map(_.toString).sorted.sameElements(rows.map(_.toString).sorted))
    // a deletion always targets an id that was actually inserted — never
    // one that was itself converted to a deletion (reference buffers only
    // real inserts)
    val converted = rows.filter(_.getBoolean(4)).map(_.getLong(2)).toSet
    dels.foreach(r => assert(!converted.contains(r.getLong(0)),
      s"delete targets converted id ${r.getLong(0)}"))
  }

  test("text protocol parse + read") {
    assert(VectorText.parse("") == None)
    val VectorText.Insert(v) = VectorText.parse("i 7,1.0,2.0,3.0").get
    assert(v.id == 7 && v.value.sameElements(Array(1f, 2f, 3f)))
    val VectorText.Delete(id) = VectorText.parse("d 42").get
    assert(id == 42)
    val VectorText.Query(q) = VectorText.parse("q 0.5,0.25").get
    assert(q.sameElements(Array(0.5f, 0.25f)))
    intercept[IllegalArgumentException](VectorText.parse("x nope"))

    val path = tmp("v.txt")
    Files.writeString(java.nio.file.Paths.get(path),
      "i 0,1.0,2.0\nq 9.0,9.0\nd 0\n\ni 1,3.0,4.0\n")
    val data = VectorText.read(spark, path).collect().sortBy(_.getLong(2))
    assert(data.length == 3)
    assert(data(1).getBoolean(4)) // the delete
    val qs = VectorText.readQueries(spark, path).collect()
    assert(qs.length == 1 && qs(0).getSeq[Float](1).toArray.sameElements(Array(9f, 9f)))
  }
}
