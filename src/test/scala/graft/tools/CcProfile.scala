package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: phase timing for dedup_clusters at a given sf.
 * Run: sbt "Test/runMain graft.tools.CcProfile [sfDir]" */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[cc] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    val docs = graft.queries.Tables(spark, dir, "documents")
    val pairs = time("minhashPairs+write") {
      val p = graft.ops.Dedup.minhashPairs(docs,
        numHashes = graft.queries.AnnQueries.MinhashNumHashes,
        rowsPerBand = 4, shingleWidth = 3,
        threshold = graft.queries.AnnQueries.MinhashThreshold,
        maxBucketSize = graft.queries.AnnQueries.MaxBucketSize)
      graft.queries.OracleAux.write(p.select(col("i"), col("j")), dir,
        "dedup_cluster_pairs")
      graft.queries.OracleAux.read(spark, dir, "dedup_cluster_pairs")
    }
    println(s"[cc] pairs: ${pairs.count()}")
    val comp = time("connectedComponents") {
      val c = graft.ops.Dedup.connectedComponents(pairs)
      c.count()
      c
    }
    println(s"[cc] nodes: ${comp.count()}")
    // second run (warm)
    time("connectedComponents warm") {
      graft.ops.Dedup.connectedComponents(pairs).count()
    }
    spark.stop()
  }
}
