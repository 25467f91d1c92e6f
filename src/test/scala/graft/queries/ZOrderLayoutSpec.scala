package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data-layout evidence for the 100-TB story: the same table written
 * z-order-clustered answers a 2-D selective predicate reading FAR fewer
 * rows from parquet than the shuffled layout — min/max stats per row
 * group / file turn the pushed filters into skipped IO. The assertion
 * reads the scan node's own numOutputRows metric (rows surviving
 * row-group/page pruning), not wall-clock, so it is load-independent. */
class ZOrderLayoutSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkEntry.configure(SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false"))
    .getOrCreate()
  private val dir = "/root/testdata/sf0.01"

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    def fin(p: org.apache.spark.sql.execution.SparkPlan): org.apache.spark.sql.execution.SparkPlan =
      p match {
        case a: AdaptiveSparkPlanExec => fin(a.executedPlan)
        case other => other
      }
    fin(df.queryExecution.executedPlan).collectWithSubqueries {
      case f: FileSourceScanExec => f.metrics("numOutputRows").value
    }.sum
  }

  test("z-order clustering prunes parquet IO on a 2-D predicate") {
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"))
    val total = li.count()

    // grid-normalize the two filter dimensions, interleave with the
    // oracle-gated ZOrder curve, range-partition + sort on the curve
    // value: each output file covers a tight (partkey, suppkey) tile
    val stats = li.agg(
      min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).first()
    val (pMin, pMax) = (stats.getLong(0), stats.getLong(1))
    val (sMin, sMax) = (stats.getLong(2), stats.getLong(3))
    val bits = 8
    def cell(c: org.apache.spark.sql.Column, lo: Long, hi: Long) =
      least(lit((1 << bits) - 1), ((c - lo) * (1 << bits) / (hi - lo + 1))
        .cast("int"))
    val curve = graft.functions.SpaceFillingCurve("zorder", 2, bits)
    val z = udf((x: Int, y: Int) =>
      curve.index(Array(x.toLong, y.toLong)).toLong)
    val zed = li.withColumn("zv",
      z(cell(col("l_partkey"), pMin, pMax), cell(col("l_suppkey"), sMin, sMax)))

    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    zed.drop("zv").repartition(8) // shuffled layout: every file spans the space
      .write.mode("overwrite").parquet(s"$base/shuffled")
    zed.repartitionByRange(8, col("zv")).sortWithinPartitions("zv").drop("zv")
      .write.mode("overwrite").parquet(s"$base/zordered")

    // 2-D selective predicate: a tight tile in (partkey, suppkey)
    val pW = math.max((pMax - pMin) / 10, 1L)
    val sW = math.max((sMax - sMin) / 10, 1L)
    def q(path: String) = spark.read.parquet(path)
      .where(col("l_partkey").between(pMin, pMin + pW) &&
        col("l_suppkey").between(sMin, sMin + sW))
    val shuffledRows = scanRows(q(s"$base/shuffled"))
    val zorderedRows = scanRows(q(s"$base/zordered"))
    val hits = q(s"$base/zordered").count()
    info(s"total=$total scan(shuffled)=$shuffledRows scan(zordered)=$zorderedRows hits=$hits")
    // same answer from both layouts
    assert(q(s"$base/shuffled").count() == hits)
    // the clustered layout must skip most of the table the shuffled
    // layout reads (file/row-group stats + pushed filters)
    assert(zorderedRows * 2 <= shuffledRows,
      s"zordered scan $zorderedRows should be well under shuffled $shuffledRows")
  }
}
