package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Metric

/** Scratch dev driver (see verify skill): currently drives the round-11
 * routed-kNN-join bench section shape end-to-end at a small scale — the
 * same Bench.scala code path (limit/cache → sample fit → route both
 * sides → pid-keyed cogroup → self-drop) so the new bench wiring is
 * exercised before a 20-minute full bench run. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.ops.Ann
    import graft.partitioners.KMeansPartitioner

    // mirror Bench: derived corpus slice, fit on a sample, route both
    // sides, cogroup, drop self — measured joinN vecs all-kNN
    val dir = "/root/testdata/sf0.01"
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("vec_id").as("eventTime"))
      .repartition(8).cache()
    val nVec = vecs.count()
    val joinN = math.min(50000L, nVec).toInt
    val joinVecs = vecs.limit(joinN).cache()
    joinVecs.count()
    val joinSample = joinVecs.limit(4096).select("vec").collect()
      .map(_.getSeq[Float](0).toArray)
    val joinModel = KMeansPartitioner.fit(joinSample, k = 64,
      replicationFactor = 1, iterations = 4, seed = 42L, queryProbes = 4)
    val bJoin = spark.sparkContext.broadcast(joinModel)
    def joinRun(): Long = {
      val dr = joinVecs.as[(Long, Array[Float], Long)]
        .flatMap { case (id, v, ts) =>
          bJoin.value.dataPartitions(v, id, ts)
            .map(pid => Ann.VecRow(pid, id, ts, v)) }
      val qr = joinVecs.as[(Long, Array[Float], Long)]
        .flatMap { case (qid, v, _) =>
          bJoin.value.queryPartitions(v, Long.MaxValue / 2, Long.MaxValue / 2)
            .map(pid => Ann.QueryRow(pid, qid, Long.MaxValue / 2,
              Long.MaxValue / 2, v)) }
      Ann.searchRouted(dr, qr, 6, Metric.L2, useHnsw = false)
        .where(col("id") =!= col("qid")).count()
    }
    val t0 = System.nanoTime()
    val rows = joinRun()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"PROBE knn_join bench shape: joinN=$joinN rows=$rows " +
      s"sec=${"%.2f".format(sec)} vec_per_sec=${"%.1f".format(joinN / sec)}")
    assert(rows > 0, "empty join result")
    spark.stop()
  }
}
