package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Metric

/** Scratch dev driver (see verify skill): currently profiles the routed
 * kNN join's stages — routing flatMaps, the cogroup partials, the list
 * merge, the final window — to find where the 47 s at 100k vectors goes
 * (the pair-scan arithmetic alone is ~3 s at calib speed). */
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
    import spark.implicits._
    import graft.ops.Ann
    import graft.partitioners.KMeansPartitioner

    val sfDir = "/root/testdata/sf0.01"
    val n = 100000
    val vecs = graft.Bench.derivedVectorsN(spark, sfDir, 2)
      .limit(n).repartition(16).cache()
    vecs.count()
    val sample = vecs.limit(4096).select("vec").collect()
      .map(_.getSeq[Float](0).toArray)
    val model = graft.partitioners.SaltedPartitioner.fromSample(
      KMeansPartitioner.fit(sample, k = 128, replicationFactor = 1,
        iterations = 4, seed = 42L, queryProbes = 4),
      sample, n, targetPerPartition = 500L)

    val calib = graft.Bench.calibrationBf(spark, 16)

    // stage 1: routing flatMaps alone
    val (dr, qr) = Ann.selfJoinRouting(vecs.toDF(), model)
    val (nd, tDr) = time(dr.count())
    val (nq, tQr) = time(qr.count())

    // stage 2: cogroup partials (current exactCellScan), no merge
    def partials() = dr.groupByKey(_.pid).cogroup(qr.groupByKey(_.pid)) {
      (_, vs, qs) =>
        val qList = qs.toArray
        if (qList.isEmpty) Iterator.empty
        else {
          // same as Ann's private exactCellScan query-outer branch via
          // the public path: count through knnJoinRouted is stage 3;
          // here emit one marker per query to time cogroup+scan alone
          val rows = vs.toArray
          var acc = 0L
          java.util.Arrays.sort(rows.map(_.id))
          acc += rows.length
          Iterator.single(acc + qList.length)
        }
    }
    val (_, tCgNoScan) = time(partials().toDF().count())

    // stage 3: full search (cogroup + scan + list merge), no window
    val (_, tSearch) = time(
      Ann.searchRouted(dr, qr, 6, Metric.L2, useHnsw = false).count())

    // stage 4: the whole operator
    val (_, tFull) = time(Ann.knnJoin(vecs.toDF(), 5, model).count())

    // skew diagnosis: per-cell pair mass (|d_c| * |q_c|), top cells
    val dc = dr.groupByKey(_.pid).count().toDF("pid", "nd")
    val qc = qr.groupByKey(_.pid).count().toDF("pid2", "nq")
    val mass = dc.join(qc, col("pid") === col("pid2"))
      .select(col("pid"), col("nd"), col("nq"),
        (col("nd") * col("nq")).as("pairs"))
      .orderBy(col("pairs").desc).limit(8).collect()
    val total = dc.join(qc, col("pid") === col("pid2"))
      .agg(sum(col("nd") * col("nq"))).first().getLong(0)
    println(s"PROBE join-skew totalPairs=$total top=" + mass.map(r =>
      s"(pid=${r.getInt(0)} d=${r.getLong(1)} q=${r.getLong(2)} " +
      s"p=${r.getLong(3)})").mkString(" "))

    println(s"PROBE join-profile n=$n calib=${"%.2f".format(calib)} " +
      s"dr=${"%.1f".format(tDr)}s($nd rows) qr=${"%.1f".format(tQr)}s($nq) " +
      s"cogroup-noscan=${"%.1f".format(tCgNoScan)}s " +
      s"searchRouted=${"%.1f".format(tSearch)}s " +
      s"full=${"%.1f".format(tFull)}s")
    spark.stop()
  }
}
