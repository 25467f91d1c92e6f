package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Layout-for-join evidence (the co-location half of the 100-TB story,
 * next to ZOrderLayoutSpec's layout-for-scan): two tables bucketed on
 * the join key answer an equi-join with ZERO shuffle exchanges — the
 * bucketing IS the exchange, paid once at write time and amortized over
 * every subsequent join. Asserted on the executed plan, not wall-clock. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkEntry.configure(SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    // static conf: must be set before the session exists (saveAsTable
    // needs a writable warehouse; a getOrCreate-reused session from a
    // prior suite in the same JVM already has one under /tmp)
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-bucket-wh").toString)
    .config("spark.ui.enabled", "false"))
    .getOrCreate()
  private val dir = "/root/testdata/sf0.01"

  private def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    def fin(p: org.apache.spark.sql.execution.SparkPlan): org.apache.spark.sql.execution.SparkPlan =
      p match {
        case a: AdaptiveSparkPlanExec => fin(a.executedPlan)
        case other => other
      }
    var n = 0
    fin(df.queryExecution.executedPlan).foreach {
      case _: ShuffleExchangeExec => n += 1
      case _ => ()
    }
    n
  }

  test("bucketed tables join with zero shuffle exchanges") {
    spark.sparkContext.setLogLevel("ERROR")
    // runtime confs (SparkEntry.configure pins AQE on at build time):
    // no broadcast so the exchange question is real, and audit the
    // STATIC plan — AQE hides exchanges inside QueryStageExec (held as
    // `plan`, not as children), so a tree traversal undercounts to zero
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try bucketedJoinBody()
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  private def bucketedJoinBody(): Unit = {
    val o = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))

    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")

    def q(ot: org.apache.spark.sql.DataFrame, lt: org.apache.spark.sql.DataFrame) =
      ot.join(lt, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))

    val plain = q(o, li)
    val bucketed = q(spark.table("orders_b"), spark.table("lineitem_b"))

    // same answer both ways
    assert(plain.collect().toSet.map((r: org.apache.spark.sql.Row) =>
        (r.getString(0), r.getLong(1)))
      == bucketed.collect().toSet.map((r: org.apache.spark.sql.Row) =>
        (r.getString(0), r.getLong(1))))

    val plainShuffles = shuffles(plain)
    val bucketedShuffles = shuffles(bucketed)
    info(s"shuffles: plain=$plainShuffles bucketed=$bucketedShuffles")
    // unbucketed: both join sides exchange (+ the agg's); bucketed: the
    // JOIN needs none — only the small post-join aggregation exchanges
    assert(plainShuffles >= 2, "unbucketed join must shuffle both sides")
    assert(bucketedShuffles <= 1,
      "bucketed join must not shuffle the join inputs")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }
}
