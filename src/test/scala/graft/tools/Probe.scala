package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Metric

/** Scratch dev driver (see verify skill): currently drives the bench's
 * HNSW kNN-join flavor (per-sub-cell graphs, salted model) at a small
 * scale and checks recall vs the exact join — the new bench wiring
 * exercised before a full run. */
object Probe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Ann
    import graft.partitioners.KMeansPartitioner

    val sfDir = "/root/testdata/sf0.01"
    val n = 20000
    val vecs = graft.Bench.derivedVectorsN(spark, sfDir, 1)
      .limit(n).repartition(16).cache()
    vecs.count()
    val sample = vecs.limit(4096).select("vec").collect()
      .map(_.getSeq[Float](0).toArray)
    val model = graft.partitioners.SaltedPartitioner.fromSample(
      KMeansPartitioner.fit(sample, k = 32, replicationFactor = 1,
        iterations = 4, seed = 42L, queryProbes = 4),
      sample, n, targetPerPartition = 500L)

    def sets(useHnsw: Boolean) = Ann.knnJoin(vecs.toDF(), 5, model,
        Metric.L2, useHnsw = useHnsw)
      .groupBy("qid").agg(collect_set(col("id")).as("ids")).collect()
    val (exact, tE) = time(sets(useHnsw = false))
    val (hnsw, tH) = time(sets(useHnsw = true))
    val truth = exact.map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val per = hnsw.flatMap { r =>
      truth.get(r.getLong(0)).map(t =>
        r.getSeq[Long](1).count(t.contains).toDouble / t.size)
    }
    val rec = if (per.nonEmpty) per.sum / per.length else 0.0
    println(s"PROBE join-hnsw n=$n exact=${"%.1f".format(tE)}s " +
      s"hnsw=${"%.1f".format(tH)}s recall@5=${"%.4f".format(rec)} " +
      s"qids exact=${exact.length} hnsw=${hnsw.length}")
    assert(rec > 0.5, s"hnsw join recall $rec")
    spark.stop()
  }
}
