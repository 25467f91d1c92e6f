package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.Metric
import graft.store.ColdTier
import graft.streaming.VectorStreamJob
import graft.streaming.VectorStreamJob.{PartialResult, StreamEvent}
import graft.partitioners.SimplePartitioner

/** Dev probe: drives the library surface on a real SparkSession.
 * Run: sbt "Test/runMain graft.tools.Probe" */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    println("== cold tier: seal -> sealIndexes/sealCodes -> evict -> gc ==")
    val dir = java.nio.file.Files.createTempDirectory("probe-cold").toString
    def vecs(seed: Long, t0: Long) = {
      val r = new java.util.Random(seed)
      (0 until 300).map(i => (seed * 1000 + i,
        Array.fill(16)(r.nextGaussian().toFloat), t0 + i))
        .toDF("id", "vec", "eventTime")
    }
    ColdTier.seal(vecs(1L, 0L), dir, 1L)
    ColdTier.seal(vecs(2L, 50000L), dir, 2L)
    ColdTier.sealIndexes(spark, dir, Seq(1L, 2L), Metric.L2, m = 8,
      efConstruction = 32)
    ColdTier.evict(spark, dir, 40000L)
    val deleted = ColdTier.gc(spark, dir)
    println(s"gc deleted: ${deleted.map(p => new java.io.File(p).getName).sorted}")
    val q = Seq((7L, Array.fill(16)(0f), 50300L, 10000L))
      .toDF("qid", "qv", "qtime", "ttl")
    val hits = ColdTier.searchIndexed(spark, dir, q, 5, Metric.L2, shortlist = 20)
    println(s"post-gc searchIndexed rows=${hits.count()}")
    hits.show(5, truncate = false)

    println("== streaming: DUMP element -> stateDumps decode ==")
    implicit val sc = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val dumps = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val routed = VectorStreamJob.route(input.toDS(), SimplePartitioner(4))
    val sq = VectorStreamJob.partials(routed, Metric.L2, maxTtl = 1000000L)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[PartialResult], _: Long) =>
        VectorStreamJob.stateDumps(b.toDF()).collect()
          .foreach(r => dumps.synchronized { dumps += ((r.getLong(2), r.getLong(3))) })
        ()
      }.start()
    val vr = new java.util.Random(42)
    input.addData((0 until 20).map(i =>
      StreamEvent("i", i.toLong, Array.fill(8)(vr.nextGaussian().toFloat), i.toLong, 0L, 0)): _*)
    sq.processAllAvailable()
    input.addData(StreamEvent("d", 3L, null, 100L, 0L, 0),
      StreamEvent("s", 777L, null, 200L, 0L, 0))
    sq.processAllAvailable()
    sq.stop()
    val live = dumps.synchronized(dumps.map(_._1).sorted.toVector)
    println(s"dump live ids (20 inserts - delete of 3): $live")
    assert(live == (0 until 20).filter(_ != 3).map(_.toLong).toVector, "live set mismatch")

    println("== bench corpus: derivedVectorsN multiplies deterministically ==")
    val v1 = graft.Bench.derivedVectorsN(spark, "/root/testdata/sf0.001", 1)
    val v3 = graft.Bench.derivedVectorsN(spark, "/root/testdata/sf0.001", 3)
    val (n1, n3) = (v1.count(), v3.count())
    println(s"mult=1 -> $n1 rows, mult=3 -> $n3 rows (x${n3.toDouble / n1})")
    assert(n3 == 3 * n1)
    val base = v1.select("id").as[Long].collect().toSet
    val rep = v3.select("id").as[Long].collect().toSet
    assert(base.subsetOf(rep) && rep.size == 3 * base.size, "replica ids must extend base ids")
    println("probe OK")
    spark.stop()
  }
}
