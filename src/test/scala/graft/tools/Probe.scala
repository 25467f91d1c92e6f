package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch dev driver (see verify skill): currently times pipeline_rag
 * at sf0.1 — warm + 2 reps, mirroring the bench's loop. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    (1 to 3).foreach { rep =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("pipeline_rag")(spark, dir).count()
      println(f"probe rag rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    println("probe OK")
  }
}
