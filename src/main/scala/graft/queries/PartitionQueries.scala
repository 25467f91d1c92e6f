package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Oracle-checkable slices of the partitioner family (reference §2.2):
 * deterministic hash partitioning with balance accounting (P1 + the
 * balance telemetry of LSHWithSpaceFillingPartitionFunction.java:201-209)
 * and space-filling-curve grid indexing (P5/P8's curve step) — expressed
 * in pure integer arithmetic so DuckDB computes the identical value.
 * (The seeded-LSH and adaptive partitioners are validated by ScalaTest
 * recall/balance specs instead — their Gaussian draws have no SQL twin.)
 */
object PartitionQueries {
  val NumPartitions = 32
  val Bits = 7

  /** Knuth multiplicative hash -> partition id, cross-engine exact. The
   * pre-fold to 31 bits keeps the product under 2^63 at any SF — Spark
   * would silently wrap the overflow while DuckDB raises, so the
   * "identical value" claim would break both ways. Identity for every
   * l_orderkey < 2^31 (TPC-H up to SF ~350). */
  private val pidExpr =
    s"(((l_orderkey % 2147483648) * 2654435761) % 4294967296) % $NumPartitions"

  /** 7-bit quantization of embedding dims 1..2 (1-based), clamped to [-1,1]. */
  private def quant(arrayAccess: String): String =
    s"CAST(floor((least(greatest(CAST($arrayAccess AS DOUBLE), -1.0), 1.0) + 1.0) / 2.0 * 127.0) AS BIGINT)"

  /** Z-order bit interleave as plain arithmetic: bit i of dim0 at position
   * 2i (least significant within plane, matching graft.functions.ZOrderCurve),
   * bit i of dim1 at 2i+1. `shift` renders an engine-specific right-shift
   * (Spark: shiftright(x, i); DuckDB: x >> i). */
  private def zorderExpr(qx: String, qy: String,
      shift: (String, Int) => String): String =
    (0 until Bits).map { i =>
      val px = 1L << (2 * i)
      val py = 1L << (2 * i + 1)
      s"((${shift(qx, i)} % 2) * $px + (${shift(qy, i)} % 2) * $py)"
    }.mkString(" + ")

  private def sparkShift(x: String, i: Int) = s"shiftright($x, $i)"
  private def duckShift(x: String, i: Int) = s"(($x) >> $i)"

  /** Binary-reflected Gray code g = x XOR (x >> 1) — the per-coordinate
   * step of [[graft.functions.GrayCurve]], closed-form in both engines
   * (Spark `^`, DuckDB `xor()`). */
  private def sparkGray(x: String) = s"((($x)) ^ ${sparkShift(s"($x)", 1)})"
  private def duckGray(x: String) = s"xor(($x), ${duckShift(x, 1)})"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "part_hash_balance" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .withColumn("pid", expr(pidExpr))
        .groupBy("pid").agg(count(lit(1)).as("n"))
    },

    "part_zorder" -> { (s, dir) =>
      val qx = quant("element_at(embedding, 1)")
      val qy = quant("element_at(embedding, 2)")
      Tables(s, dir, "embeddings")
        .select(col("vec_id"), expr(zorderExpr(qx, qy, sparkShift)).as("zindex"))
    },

    "part_gray" -> { (s, dir) =>
      // the Gray-coded curve (P5's `gray` option): per-coordinate
      // binary-reflected Gray then the same Z interleave — matches
      // GrayCurve.index by construction, closed-form in SQL
      val gx = sparkGray(quant("element_at(embedding, 1)"))
      val gy = sparkGray(quant("element_at(embedding, 2)"))
      Tables(s, dir, "embeddings")
        .select(col("vec_id"), expr(zorderExpr(gx, gy, sparkShift)).as("gindex"))
    })

  def oracles: Map[String, String] = Map(
    "part_hash_balance" ->
      s"""SELECT $pidExpr AS pid, COUNT(*) AS n
         |FROM lineitem GROUP BY 1""".stripMargin,

    "part_zorder" -> {
      val qx = quant("embedding[1]")
      val qy = quant("embedding[2]")
      s"""SELECT vec_id, ${zorderExpr(qx, qy, duckShift)} AS zindex FROM embeddings"""
    },

    "part_gray" -> {
      val gx = duckGray(quant("embedding[1]"))
      val gy = duckGray(quant("embedding[2]"))
      s"""SELECT vec_id, ${zorderExpr(gx, gy, duckShift)} AS gindex FROM embeddings"""
    })
}
