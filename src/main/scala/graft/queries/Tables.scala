package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table loading + cross-engine-exact helpers shared by the query suites. */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Events with the timestamp column normalized to int64 epoch-nanos
   * `tsn` (exactly comparable with the DuckDB oracle via epoch_ns(ts),
   * which reads parquet timestamps at us precision → ns = us * 1000).
   * Handles both generator layouts: parquet TIMESTAMP(NANOS) read as raw
   * int64 via spark.sql.legacy.parquet.nanosAsLong=true (truncated to us
   * resolution to match DuckDB), and parquet timestamp[us] read as a
   * Spark timestamp (converted via unix_micros under the UTC session tz,
   * so naive-timestamp semantics match DuckDB's). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = apply(spark, dir, "events")
    val tsn = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("(ts div 1000) * 1000")
      case _ => expr("unix_micros(cast(ts as timestamp)) * 1000")
    }
    raw.withColumn("tsn", tsn).drop("ts")
  }

  /** Exact cross-engine double sum: sum in DECIMAL(18,4) (exact, order-
   * independent), cast back to double. Bit-identical in Spark and DuckDB
   * regardless of row order or partial-aggregation splits. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** SQL (DuckDB) twin of [[dsum]]. */
  def dsumSql(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE)"
}
