package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table loading + cross-engine-exact helpers shared by the query suites. */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Events with the ns-timestamp column read as raw int64 nanos (Spark has
   * no TIMESTAMP(NANOS) support; integer nanos are also exactly comparable
   * with the DuckDB oracle via epoch_ns(ts)). Truncated to microsecond
   * resolution because DuckDB itself reads parquet ns-timestamps at us
   * precision. Requires spark.sql.legacy.parquet.nanosAsLong=true. */
  def events(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events")
      .withColumn("tsn", expr("(ts div 1000) * 1000"))
      .drop("ts")

  /** Exact cross-engine double sum: sum in DECIMAL(18,4) (exact, order-
   * independent), cast back to double. Bit-identical in Spark and DuckDB
   * regardless of row order or partial-aggregation splits. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** SQL (DuckDB) twin of [[dsum]]. */
  def dsumSql(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE)"
}
