package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Relational operator coverage: scan, project/filter, hash/broadcast join,
 * semi/anti join, partial+final aggregation, distinct aggregation, window
 * functions, sort/limit top-k, set operations, rollup, interval join,
 * time-windowed and sessionized event aggregation.
 *
 * Every query has a DuckDB oracle twin in [[Relational.oracles]]; all
 * floating outputs go through the DECIMAL-sum trick (Tables.dsum) or are
 * single deterministic double ops, so results hash-match cross-engine.
 */
object Relational {
  import Tables.{dsum, dsumSql}

  private val thirtyMinNs = 1800000000000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
    },

    "q2_top_revenue_orders" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val rev = li.groupBy("l_orderkey")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      rev.join(o, rev("l_orderkey") === o("o_orderkey"))
        .select(col("o_orderkey"), col("o_orderpriority"), col("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(20)
    },

    "q3_revenue_by_nation" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
    },

    "q4_semi_join" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers_with_orders"))
    },

    "q5_anti_join" -> { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_customers_without_orders"))
    },

    "q6_window_topn" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
    },

    "q7_distinct_agg" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_items"),
          max(col("l_quantity")).as("max_qty"))
    },

    "q8_setops" -> { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
      val a = li.where(col("l_returnflag") === "R").select(col("l_partkey"))
      val b = li.where(col("l_linestatus") === "F").select(col("l_partkey"))
      a.except(b).select(lit("except").as("op"), col("l_partkey"))
        .unionAll(a.intersect(b).select(lit("intersect").as("op"), col("l_partkey")))
    },

    "q9_events_hourly" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("hour_bucket", floor(col("tsn") / lit(3600000000000L)))
        .groupBy("hour_bucket", "event_type")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    },

    "q10_sessionize" -> { (s, dir) =>
      val e = Tables.events(s, dir)
      val w = Window.partitionBy("user_id").orderBy("tsn", "event_id")
      e.withColumn("prev", lag(col("tsn"), 1).over(w))
        .withColumn("brk",
          when(col("prev").isNull || col("tsn") - col("prev") > thirtyMinNs, 1).otherwise(0))
        .withColumn("sess", sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sess")
        .agg(count(lit(1)).as("n_events"), min(col("tsn")).as("t_start"),
          max(col("tsn")).as("t_end"))
    },

    "q11_interval_join" -> { (s, dir) =>
      val o = Tables(s, dir, "orders")
      val li = Tables(s, dir, "lineitem")
      o.join(li, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_shipped_30d"),
          dsum(col("l_extendedprice")).as("sum_price"))
    },

    "q12_rollup" -> { (s, dir) =>
      Tables(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
    },

    "q13_conditional_agg" -> { (s, dir) =>
      // CASE-based conditional aggregation (promo-share shape)
      Tables(s, dir, "lineitem")
        .join(broadcast(Tables(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          dsum(when(col("p_type").startsWith("STANDARD"),
            col("l_extendedprice")).otherwise(lit(0.0))).as("standard_rev"),
          dsum(col("l_extendedprice")).as("total_rev"),
          count(when(col("l_quantity") > 25, 1)).as("n_bulk"))
    },

    "q14_having" -> { (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
        .where(col("n_orders") >= 5)
    },

    "q15_scalar_subquery" -> { (s, dir) =>
      // customers above their nation's average balance
      val c = Tables(s, dir, "customer")
      val avgByNation = c.groupBy("c_nationkey")
        .agg((dsum(col("c_acctbal")) / count(lit(1))).as("nation_avg"))
      c.join(broadcast(avgByNation), "c_nationkey")
        .where(col("c_acctbal") > col("nation_avg"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_above_avg"))
    },

    "q16_exists_corr" -> { (s, dir) =>
      // orders having at least one bulk lineitem (correlated EXISTS)
      val o = Tables(s, dir, "orders")
      val bulk = Tables(s, dir, "lineitem").where(col("l_quantity") >= 45)
        .select(col("l_orderkey"))
      o.join(bulk, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders_with_bulk"))
    },

    "q17_json_extract" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"))
    },

    "q19_sliding_windows" -> { (s, dir) =>
      // SLIDING windows via Spark's built-in window() (1h width, 30min
      // slide — every event lands in exactly width/slide = 2 windows).
      // The twin replays the documented expansion (start = slide-aligned
      // floors covering the event) in pure integer microsecond
      // arithmetic; window starts surface as unix seconds so no
      // timestamp rendering semantics cross the engine boundary.
      val e = Tables.events(s, dir)
        .withColumn("ts", timestamp_micros((col("tsn") / 1000).cast("long")))
      e.groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(unix_timestamp(col("window.start")).as("win_start"),
          col("event_type"), col("n"), col("sum_value"))
    },

    "q18_retention" -> { (s, dir) =>
      // hour-over-hour cohort retention: of the users active in hour h,
      // how many return in h+1. The self-join keys on (hour, user) over
      // the DISTINCT (hour, user) frame — both sides are activity-sized,
      // not event-sized, and shuffle on the composite key (the
      // analytics-warehouse retention shape).
      val a = Tables.events(s, dir)
        .select(floor(col("tsn") / lit(3600000000000L)).as("h"),
          col("user_id"))
        .distinct()
      val act = a.groupBy("h").agg(count(lit(1)).as("active"))
      val ret = a.join(
          a.select((col("h") - 1).as("h"), col("user_id")),
          Seq("h", "user_id"))
        .groupBy("h").agg(count(lit(1)).as("retained"))
      act.join(ret, Seq("h"), "left")
        .select(col("h").as("hour_bucket"), col("active"),
          coalesce(col("retained"), lit(0L)).as("retained"),
          (coalesce(col("retained"), lit(0L)).cast("double") / col("active"))
            .as("retention_rate"))
    })

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |${dsumSql("l_quantity")} AS sum_qty,
         |${dsumSql("l_extendedprice")} AS sum_base_price,
         |${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |${dsumSql("l_quantity")} / COUNT(*) AS avg_qty,
         |COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q2_top_revenue_orders" ->
      s"""WITH rev AS (
         |  SELECT l_orderkey, ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue
         |  FROM lineitem GROUP BY l_orderkey)
         |SELECT o_orderkey, o_orderpriority, revenue
         |FROM rev JOIN orders ON l_orderkey = o_orderkey
         |ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin,

    "q3_revenue_by_nation" ->
      s"""SELECT r_name, n_name,
         |${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name""".stripMargin,

    "q4_semi_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers_with_orders
        |FROM customer WHERE EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment""".stripMargin,

    "q5_anti_join" ->
      """SELECT c_nationkey, COUNT(*) AS n_customers_without_orders
        |FROM customer WHERE NOT EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey""".stripMargin,

    "q6_window_topn" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,

    "q7_distinct_agg" ->
      """SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts,
        |COUNT(*) AS n_items, MAX(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_suppkey""".stripMargin,

    "q8_setops" ->
      """SELECT 'except' AS op, l_partkey FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        |  EXCEPT
        |  SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F')
        |UNION ALL
        |SELECT 'intersect' AS op, l_partkey FROM (
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
        |  INTERSECT
        |  SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F')""".stripMargin,

    "q9_events_hourly" ->
      s"""SELECT CAST(FLOOR(epoch_ns(ts) / 3600000000000.0) AS BIGINT) AS hour_bucket,
         |event_type, COUNT(*) AS n, ${dsumSql("value")} AS sum_value
         |FROM events GROUP BY 1, 2""".stripMargin,

    "q10_sessionize" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS tsn FROM events),
         |x AS (SELECT user_id, event_id, tsn,
         |  lag(tsn) OVER (PARTITION BY user_id ORDER BY tsn, event_id) AS prev FROM e),
         |b AS (SELECT user_id, tsn,
         |  CASE WHEN prev IS NULL OR tsn - prev > $thirtyMinNs THEN 1 ELSE 0 END AS brk,
         |  event_id FROM x),
         |s AS (SELECT user_id, tsn,
         |  SUM(brk) OVER (PARTITION BY user_id ORDER BY tsn, event_id
         |    ROWS UNBOUNDED PRECEDING) AS sess FROM b)
         |SELECT user_id, CAST(sess AS BIGINT) AS sess, COUNT(*) AS n_events,
         |  MIN(tsn) AS t_start, MAX(tsn) AS t_end
         |FROM s GROUP BY user_id, sess""".stripMargin,

    "q11_interval_join" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_shipped_30d,
         |${dsumSql("l_extendedprice")} AS sum_price
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |  AND l_shipdate >= o_orderdate
         |  AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
         |GROUP BY o_orderpriority""".stripMargin,

    "q12_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q13_conditional_agg" ->
      s"""SELECT p_brand,
         |${dsumSql("CASE WHEN p_type LIKE 'STANDARD%' THEN l_extendedprice ELSE 0.0 END")} AS standard_rev,
         |${dsumSql("l_extendedprice")} AS total_rev,
         |COUNT(CASE WHEN l_quantity > 25 THEN 1 END) AS n_bulk
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand""".stripMargin,

    "q14_having" ->
      s"""SELECT o_custkey, COUNT(*) AS n_orders,
         |${dsumSql("o_totalprice")} AS spend
         |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5""".stripMargin,

    "q15_scalar_subquery" ->
      s"""WITH a AS (SELECT c_nationkey,
         |  ${dsumSql("c_acctbal")} / COUNT(*) AS nation_avg
         |  FROM customer GROUP BY c_nationkey)
         |SELECT c.c_nationkey, COUNT(*) AS n_above_avg
         |FROM customer c JOIN a ON c.c_nationkey = a.c_nationkey
         |WHERE c.c_acctbal > a.nation_avg
         |GROUP BY c.c_nationkey""".stripMargin,

    "q16_exists_corr" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders_with_bulk
        |FROM orders WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        |GROUP BY o_orderstatus""".stripMargin,

    "q17_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,

    "q19_sliding_windows" ->
      s"""WITH e AS (SELECT epoch_ns(ts) // 1000 AS tus, event_type, value
         |  FROM events),
         |x AS (SELECT ((tus // 1800000000) - k.k) * 1800000000 AS ws,
         |    event_type, value
         |  FROM e, unnest(range(2)) AS k(k)
         |  WHERE ((tus // 1800000000) - k.k) * 1800000000 >= 0
         |    AND tus < ((tus // 1800000000) - k.k) * 1800000000 + 3600000000)
         |SELECT ws // 1000000 AS win_start, event_type, COUNT(*) AS n,
         |  ${Tables.dsumSql("value")} AS sum_value
         |FROM x GROUP BY 1, 2""".stripMargin,

    "q18_retention" ->
      """WITH a AS (SELECT DISTINCT
        |  CAST(FLOOR(epoch_ns(ts) / 3600000000000.0) AS BIGINT) AS h,
        |  user_id FROM events),
        |act AS (SELECT h, COUNT(*) AS active FROM a GROUP BY h),
        |r AS (SELECT a.h, COUNT(*) AS retained
        |  FROM a JOIN a b ON b.user_id = a.user_id AND b.h = a.h + 1
        |  GROUP BY a.h)
        |SELECT act.h AS hour_bucket, act.active,
        |  COALESCE(r.retained, 0) AS retained,
        |  CAST(COALESCE(r.retained, 0) AS DOUBLE) / act.active
        |    AS retention_rate
        |FROM act LEFT JOIN r ON r.h = act.h""".stripMargin)
}
