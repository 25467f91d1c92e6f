package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch dev driver (see verify skill): currently prints the OPTIMIZED
 * logical plan of the window-rank top-k SQL idiom over a parquet corpus,
 * so the KnnProbeRewrite widening matches the real post-optimizer shape
 * (extraOptimizations run after the main batches — InferWindowGroupLimit
 * etc. have already fired). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkEntry.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftFunctions.register(spark)
    val dir = "/root/testdata/sf0.001"
    val corpusPath = java.nio.file.Files
      .createTempDirectory("probe-corpus").toString
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("label"))
      .write.mode("overwrite").parquet(corpusPath)
    spark.read.parquet(corpusPath).createOrReplaceTempView("probe_corpus")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.limit(1).collect()(0).getSeq[Float](1).toArray
    val arr = q.map(f => s"CAST($f AS FLOAT)").mkString("array(", ",", ")")

    // public-API drive: the routed kNN join over the same corpus
    val km = graft.partitioners.KMeansPartitioner.fit(
      e.limit(1000).select("embedding").collect()
        .map(_.getSeq[Float](0).toArray),
      k = 8, replicationFactor = 1, iterations = 4, seed = 42L,
      queryProbes = 4)
    val joined = graft.ops.Ann.knnJoin(
      e.select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("vec_id").as("eventTime")), 5, km).count()
    println(s"PROBE Ann.knnJoin rows=$joined")
    assert(joined > 0)

    val windowed = spark.sql(
      s"""SELECT id, dist FROM (
         |  SELECT id, l2_distance(vec, $arr) AS dist,
         |         row_number() OVER (ORDER BY l2_distance(vec, $arr)) AS rn
         |  FROM probe_corpus) WHERE rn <= 5""".stripMargin)
    println("=== windowed (alias in OVER not referenced) optimized ===")
    println(windowed.queryExecution.optimizedPlan.treeString)

    val windowed2 = spark.sql(
      s"""SELECT id, dist FROM (
         |  SELECT id, dist, row_number() OVER (ORDER BY dist) AS rn
         |  FROM (SELECT id, l2_distance(vec, $arr) AS dist
         |        FROM probe_corpus)) WHERE rn <= 5""".stripMargin)
    println("=== windowed (ORDER BY dist alias) optimized ===")
    println(windowed2.queryExecution.optimizedPlan.treeString)

    val filtered = spark.sql(
      s"""SELECT id, dist FROM (
         |  SELECT id, l2_distance(vec, $arr) AS dist,
         |         row_number() OVER (ORDER BY l2_distance(vec, $arr)) AS rn
         |  FROM probe_corpus WHERE label = 3) WHERE rn <= 5""".stripMargin)
    println("=== windowed + WHERE label optimized ===")
    println(filtered.queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}
