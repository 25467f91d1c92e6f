package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.Metric
import graft.store.ColdTier
import graft.streaming.VectorStreamJob
import graft.streaming.VectorStreamJob.StreamEvent
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

    println("== hot->cold lifecycle on sf0.001 embeddings: stream -> TTL flush -> compact -> cold search ==")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").cast("long").as("id"), col("embedding").as("vec"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    println(s"corpus: ${emb.length} vectors, dim ${emb.head._2.length}")
    // three event-time epochs 100k apart; maxTtl 50k => each new epoch
    // retires the previous one to the cold tier
    val epochs = emb.grouped((emb.length + 2) / 3).toArray
    val cold = java.nio.file.Files.createTempDirectory("probe-hotcold").toString

    implicit val sc = spark.sqlContext
    val input = MemoryStream[StreamEvent]
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Double)]
    val q = VectorStreamJob.run(input.toDS(), SimplePartitioner(4), k = 10,
      Metric.L2, maxTtl = 50000L, useHnsw = false,
      coldDir = Some(cold), indexAtFlush = true, compactEvery = 3,
      compactTargetRows = emb.length.toLong) { b =>
      b.collect().foreach(r => merged.synchronized {
        merged += ((r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))) })
    }
    epochs.zipWithIndex.foreach { case (rows, ep) =>
      input.addData(rows.map { case (id, v) =>
        StreamEvent("i", id, v, ep * 100000L + id, 0L, 0) }.toIndexedSeq: _*)
      q.processAllAvailable()
    }
    // hot query against the last epoch, then one tick to land compaction
    val qv = epochs.last.head._2
    input.addData(StreamEvent("q", 900001L, qv, 250000L, 50000L, 10))
    q.processAllAvailable()
    q.stop()

    val hot = merged.synchronized(merged.filter(_._1 == 900001L)).sortBy(_._2)
    println(s"hot top-10 ids: ${hot.map(_._3).toList}")
    assert(hot.nonEmpty, "hot query must complete")
    val lastIds = epochs.last.map(_._1).toSet
    assert(hot.forall(r => lastIds.contains(r._3)), "hot window leaked older epochs")

    val cat = ColdTier.catalog(spark, cold)
    println(s"cold catalog: ${cat.length} segments, rows=${cat.map(_.count).sum}, " +
      s"windows=${cat.sortBy(_.minTs).map(s => (s.minTs, s.maxTs)).toList}")
    val wantCold = epochs.dropRight(1).flatMap(_.map(_._1)).toSet
    val gotCold = spark.read.parquet(cat.map(_.path): _*)
      .select("id").as[Long].collect().toSet
    assert(gotCold == wantCold,
      s"cold rows: missing=${(wantCold -- gotCold).size} extra=${(gotCold -- wantCold).size}")

    // old-window query answered losslessly by the cold tier (scan path)
    // and approximately by the flush-built HNSW sidecars (probe path)
    val qv0 = epochs.head(3)._2
    val qdf = Seq((1L, qv0, 60000L, 60000L)).toDF("qid", "qv", "qtime", "ttl")
    val exact = epochs.head
      .map { case (id, v) => (id, graft.functions.Distances.l2(qv0, v)) }
      .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toList
    val scan = ColdTier.search(spark, cold, qdf, 10, Metric.L2,
        firstWaveFraction = 1.0, terminationFactor = 1.0)
      .collect().sortBy(_.getInt(1)).map(_.getLong(2)).toList
    assert(scan == exact, s"cold scan $scan != exact $exact")
    val probed = ColdTier.searchIndexed(spark, cold, qdf, 10, Metric.L2,
        shortlist = 64)
      .collect().sortBy(_.getInt(1)).map(_.getLong(2)).toList
    val recall = probed.count(exact.contains).toDouble / 10
    println(s"cold scan bit-exact; sidecar-probe recall@10 vs exact: $recall")
    assert(recall >= 0.9, s"sidecar probe recall too low: $recall")
    println("probe OK")
    spark.stop()
  }
}
