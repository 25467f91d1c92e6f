package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Metric
import graft.functions.Distances
import graft.ops.Ann
import graft.partitioners.LshPartitioner

/** Bisect Ann.search: exact store vs HNSW through the full Spark path. */
object Probe4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rnd = new java.util.Random(42L)
    val dim = 32
    val centers = Array.fill(32)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 3200).map { i =>
      val c = centers(i % 32)
      (i.toLong, c.map(x => x + rnd.nextGaussian().toFloat * 0.05f), i.toLong)
    }
    val vdf = vecs.toDF("id", "vec", "eventTime")
    val qs = vecs.filter(_._1 % 40 == 0)
    val qdf = qs.map(v => (v._1, v._2, Long.MaxValue / 2, Long.MaxValue / 2))
      .toDF("qid", "qv", "qtime", "ttl")
    val model = LshPartitioner.seeded(16, dim, 6, 2, 4.0f, 38324L)
    val truth = qs.map { case (qid, qv, _) =>
      qid -> vecs.map(v => (v._1, Distances.l2(qv, v._2)))
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    }.toMap
    for (hnsw <- Seq(false, true)) {
      val approx = Ann.search(vdf, qdf, model, 10, Metric.L2, useHnsw = hnsw)
        .collect().groupBy(_.getLong(0))
        .map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }
      val rs = truth.map { case (q, t) =>
        approx.getOrElse(q, Set.empty).count(t.contains).toDouble / 10 }
      println(s"useHnsw=$hnsw recall = ${rs.sum / rs.size}")
      // one failing query detail
      val bad = truth.find { case (q, t) =>
        approx.getOrElse(q, Set.empty).count(t.contains) < 10 }
      bad.foreach { case (q, t) =>
        println(s"  query $q truth=${t.toList.sorted} got=${approx.getOrElse(q, Set.empty).toList.sorted}")
      }
    }
    spark.stop()
  }
}
