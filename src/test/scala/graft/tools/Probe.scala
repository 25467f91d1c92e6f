package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Metric
import graft.store.ColdTier

/** Dev probe: drives the library surface on a real SparkSession.
 * Run: sbt "Test/runMain graft.tools.Probe" */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    println("== sharded cold-tier sidecars on sf0.01 embeddings ==")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id").cast("long").as("id"), col("embedding").as("vec"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    println(s"corpus: ${emb.length} vectors, dim ${emb.head._2.length}")

    val cold = java.nio.file.Files.createTempDirectory("probe-shard").toString
    ColdTier.seal(emb.map { case (id, v) => (id, v, id) }.toSeq
      .toDF("id", "vec", "eventTime"), cold, 0L)
    // bound far under the segment size => sharded layout, parallel builds
    val bound = emb.length / 4 + 1
    val t0 = System.nanoTime()
    ColdTier.sealIndexes(spark, cold, Seq(0L), Metric.L2, m = 16,
      efConstruction = 64, maxGraphRows = bound)
    println(f"sealIndexes(maxGraphRows=$bound): ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val idx = new java.io.File(s"$cold/segment-0-hnsw")
    val shards = idx.listFiles().map(_.getName).filter(_.startsWith("shard-")).sorted
    println(s"layout: dir=${idx.isDirectory} shards=${shards.toList} " +
      s"sealed=${new java.io.File(idx, "_SEALED").exists()}")
    assert(idx.isDirectory && shards.length == 4)

    val rnd = new java.util.Random(7L)
    val qs = Array.fill(50)(emb(rnd.nextInt(emb.length)))
    val qdf = qs.zipWithIndex.map { case ((_, v), qi) =>
      (qi.toLong, v, Long.MaxValue / 2, Long.MaxValue / 2)
    }.toSeq.toDF("qid", "qv", "qtime", "ttl")
    val got = ColdTier.searchIndexed(spark, cold, qdf, 10, Metric.L2,
        shortlist = 64, efSearch = 64)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    val recall = qs.zipWithIndex.map { case ((_, qv), qi) =>
      val want = emb.map { case (id, v) =>
        (id, graft.functions.Distances.l2(qv, v)) }
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
      got(qi.toLong).count(want).toDouble / 10
    }.sum / qs.length
    println(f"sharded probe recall@10 over ${qs.length} queries: $recall%.3f")
    assert(got.values.forall(_.size == 10) && recall >= 0.9)

    // rip the commit marker off: tier must fall back to the exact scan
    assert(new java.io.File(idx, "_SEALED").delete())
    val scan = ColdTier.searchIndexed(spark, cold, qdf, 10, Metric.L2,
        shortlist = 64, efSearch = 64)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq }
    val scanRecall = qs.zipWithIndex.map { case ((_, qv), qi) =>
      val want = emb.map { case (id, v) =>
        (id, graft.functions.Distances.l2(qv, v)) }
        .sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
      scan(qi.toLong).count(want).toDouble / 10
    }.sum / qs.length
    println(f"uncommitted-dir fallback recall (exact expected): $scanRecall%.3f")
    assert(scanRecall == 1.0)
    println("probe OK")
    spark.stop()
  }
}
