package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Metric

/** Scratch dev driver (see verify skill): currently measures the
 * composed-mode streaming configurations (production 8000-row triggers
 * with flushEveryBatches=2 vs the plain-mode twin at the same trigger
 * size) at sf0.1 — the round-10 amortization experiment. */
object Probe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    import spark.implicits._
    val rows = graft.Bench.derivedVectors(spark, dir).limit(40000)
      .as[(Long, Array[Float], Long)].collect()

    def run(label: String, composed: Boolean, chunkRows: Int,
        flushEvery: Int): Unit = {
      import graft.streaming.VectorStreamJob
      import graft.streaming.VectorStreamJob.StreamEvent
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", 8)
      implicit val sqlCtx = ss.sqlContext
      val coldDir = java.nio.file.Files
        .createTempDirectory("probe-cold").toString
      val maxTtl = (rows.length / 4).toLong
      val input = MemoryStream[StreamEvent]
      val sq =
        if (composed)
          VectorStreamJob.run(input.toDS(),
            graft.partitioners.SimplePartitioner(8), k = 10, Metric.L2,
            maxTtl = maxTtl, useHnsw = true, crossBatchMerge = true,
            coldDir = Some(coldDir), flushEveryBatches = flushEvery) { m =>
            m.groupBy("qid").agg(max("latency_ms")).collect(); () }
        else
          VectorStreamJob.run(input.toDS(),
            graft.partitioners.SimplePartitioner(8), k = 10, Metric.L2,
            maxTtl = maxTtl, useHnsw = true) { m =>
            m.groupBy("qid").agg(max("latency_ms")).collect(); () }
      val qrnd = new java.util.Random(13L)
      var fed = 0L
      def feedChunk(chunk: Array[(Long, Array[Float], Long)]): Unit = {
        val inserts = chunk.map { case (id, v, _) =>
          fed += 1; StreamEvent("i", id, v, fed, 0L, 0) }
        val qs = (0 until 16).map { i =>
          val (_, v, _) = chunk(qrnd.nextInt(chunk.length))
          StreamEvent("q", 2000000000L + fed + i, v, fed, maxTtl, 10)
        }
        input.addData(inserts.toIndexedSeq ++ qs: _*)
        sq.processAllAvailable()
      }
      val chunks = rows.grouped(chunkRows).toArray
      feedChunk(chunks.head)
      val reps = chunks.tail.grouped(
        math.max(1, chunks.tail.length / 2)).toArray.map { rcs =>
        val (_, s) = time(rcs.foreach(feedChunk))
        rcs.map(_.length).sum / s
      }
      sq.stop()
      if (composed && flushEvery > 1)
        graft.streaming.VectorStreamJob.drainStaged(ss, coldDir, Metric.L2)
      val segs =
        if (composed) graft.store.ColdTier.catalog(ss, coldDir).length else 0
      println(f"probe $label: best=${reps.max}%.1f ins/s reps=${
        reps.map(r => f"$r%.0f").mkString(",")} segs=$segs")
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(coldDir))
    }

    run("plain@8k", composed = false, chunkRows = 8000, flushEvery = 1)
    run("composed@8k/fe2", composed = true, chunkRows = 8000, flushEvery = 2)
    run("composed@2k/fe8", composed = true, chunkRows = 2000, flushEvery = 8)
    println("probe OK")
  }
}
