package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev probe: phase timing for the minhash dedup pipeline at sf0.1. */
object DedupProfile {
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
      println(f"[dd] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    val docs = graft.queries.Tables(spark, dir, "documents")
    (1 to 2).foreach { rep =>
      val sigs = time(s"r$rep signatures") {
        val s = graft.ops.Dedup.minhashSignatures(docs).cache()
        s.count(); s
      }
      val bandedPairs = time(s"r$rep bucketPairs+est") {
        graft.ops.Dedup.minhashPairsFromSigs(sigs, 0.5, 500).count()
      }
      println(s"[dd] r$rep pairs=$bandedPairs")
      sigs.unpersist()
    }
    spark.stop()
  }
}
