package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Distances

/** Dev probe: drives the library surface on a real SparkSession.
 * Run: sbt "Test/runMain graft.tools.Probe" */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val joined = e.crossJoin(q).select(col("vec_id"),
      Distances.l2(col("qv"), col("embedding")).as("d"),
      Distances.cosine(col("qv"), col("embedding")).as("c"))
    println("== distances vec_id<3 ==")
    joined.filter(col("vec_id") < 3).orderBy("vec_id").collect()
      .foreach(r => println(s"${r.getLong(0)} l2=${r.getDouble(1)} cos=${r.getDouble(2)}"))
    println("== null input ==")
    val n = e.limit(1)
      .select(Distances.l2(lit(null).cast("array<float>"), col("embedding")).as("d"))
      .collect()(0)
    println(s"null-dist isNull=${n.isNullAt(0)}")
    println("== plan ==")
    println(joined.queryExecution.executedPlan.toString.take(600))
    spark.stop()
  }
}
