package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch dev driver (see the verify skill): point it at whatever
 * public API is under change, read parquet from /root/testdata, collect
 * and print. Current shape: drives the newest serving surface — an
 * IN-list filtered cold search over a snapshot-pinned tier — end to end
 * on sf0.001, as a fast sanity pass between full Verify runs. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.store.ColdTier
    import graft.Metric

    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dir = java.nio.file.Files.createTempDirectory("probe-tier").toString
    ColdTier.sealMany(e.select(col("vec_id").as("id"),
      col("embedding").as("vec"), col("vec_id").as("eventTime"),
      col("label"), pmod(col("vec_id"), lit(3)).cast("long").as("segmentId")),
      dir)
    val ver = ColdTier.snapshot(spark, dir)
    val q = e.where(col("vec_id") === 0L)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        lit(Long.MaxValue / 2).as("qtime"), lit(Long.MaxValue / 2).as("ttl"),
        array(lit(1), lit(4)).as("qfin"))
    val got = ColdTier.search(spark, dir, q, 5, Metric.L2,
      firstWaveFraction = 1.0, terminationFactor = 1.0,
      filterColumn = Some("label"), filterIn = true, snapshot = Some(ver))
    got.show(10, truncate = false)
    println(s"rows=${got.count()} version=$ver dir=$dir")
    spark.stop()
  }
}
