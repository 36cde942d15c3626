package graft.queries

import graft.QueryDef
import graft.core.Tables
import graft.operators.{EtlOps, ExactAgg}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY.md §2 operator inventory bound to the driver's synthetic tables
  * (FIXTURES.md §B mapping), each with a DuckDB oracle. Naming convention:
  * `<§2 id>_<what>`.
  *
  * Float discipline: every aggregate goes through ExactAgg so Spark's
  * parallel partial aggregation and DuckDB's single-threaded fold produce
  * bit-identical doubles. Every query ends in a total order (unique tiebreak
  * keys) because row order is not a DataFrame invariant.
  */
object EtlQueries {

  val eventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** One (scenario, column) block of the dq3 oracle: mirrors
    * Quality.distributionDrift — exact-integer histogram TV (the per-bucket
    * cross-scaled |c_ref*n_cur - c_cur*n_ref| sum as HUGEINT, gate compared
    * in integers: 1000*sum <= 100*2*nr*nc) plus the deterministic bottom-64
    * KMV cardinality estimate per side (the ax3 md5-hash formula).
    */
  private def dq3Block(scenario: String, cond: String, colName: String,
                       bexpr: String, kexpr: String): String = {
    def kmvSide(where: String, out: String): String =
      s"""(SELECT CASE WHEN COUNT(*) < 64 THEN CAST(COUNT(*) AS DOUBLE)
         |      ELSE (63e0 * 281474976710656e0) / CAST(MAX(h) AS DOUBLE) END AS $out
         |    FROM (SELECT DISTINCT CAST(concat('0x', substr(md5($kexpr), 1, 12)) AS BIGINT) AS h
         |      FROM orders WHERE $where ORDER BY h LIMIT 64))""".stripMargin
    s"""SELECT '$scenario' AS scenario, '$colName' AS "column",
       |  coalesce(nr, 0) AS n_ref, coalesce(nc, 0) AS n_cur,
       |  CAST(l1x2 AS DOUBLE) AS l1_x2,
       |  CAST(l1x2 AS DOUBLE) / (2.0 * nr * nc) AS tv,
       |  kr AS kmv_ref, kc AS kmv_cur,
       |  (coalesce(nr, 0) > 0 AND coalesce(nc, 0) > 0
       |    AND (1000 * l1x2 <= 200 * nr * nc)
       |    AND (kc * 2.0 >= kr AND kc <= kr * 2.0)) AS drift_ok
       |FROM (
       |  WITH refh AS (SELECT coalesce(CAST($bexpr AS VARCHAR), '<null>') AS b, COUNT(*) AS c
       |      FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1),
       |  curh AS (SELECT coalesce(CAST($bexpr AS VARCHAR), '<null>') AS b, COUNT(*) AS c
       |      FROM orders WHERE $cond GROUP BY 1),
       |  j AS (SELECT coalesce(refh.c, 0) AS cr, coalesce(curh.c, 0) AS cc
       |    FROM refh FULL OUTER JOIN curh USING (b)),
       |  t AS (SELECT CAST(SUM(cr) AS BIGINT) AS nr, CAST(SUM(cc) AS BIGINT) AS nc FROM j),
       |  l AS (SELECT CAST(SUM(abs(cr * nc - cc * nr)) AS HUGEINT) AS l1x2
       |    FROM j CROSS JOIN t),
       |  skr AS ${kmvSide("o_orderkey % 2 = 0", "kr")},
       |  skc AS ${kmvSide(cond, "kc")}
       |  SELECT * FROM l CROSS JOIN t CROSS JOIN skr CROSS JOIN skc)""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- §2d aggregations -------------------------------------------------

    // A1: group-sum over two keys with derived-expression sums
    // (EIA930PipelineHourlyData.py:111-118 shape on lineitem).
    QueryDef(
      "a1_group_sum",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          ExactAgg.sumExact(col("l_quantity")).as("sum_qty"),
          ExactAgg.sumExact(col("l_extendedprice")).as("sum_base_price"),
          ExactAgg.sumExact(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // A2: group-sum + pivot wide + drop incomplete rows
    // (EIA930PipelineHourlyData.py:121-131 on events).
    QueryDef(
      "a2_pivot_dropna",
      ("""SELECT * FROM (
        |  SELECT date_trunc('day', ts) AS day_ts, user_id % 20 AS ubucket,
        |""" + eventTypes.map(t =>
          s"    CAST(SUM(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(25,4)) END) AS DOUBLE) AS $t")
          .mkString(",\n") + """
        |  FROM events GROUP BY 1, 2
        |) WHERE """ + eventTypes.map(t => s"$t IS NOT NULL").mkString(" AND ") + """
        |ORDER BY day_ts, ubucket""").stripMargin) { (s, d) =>
      EtlOps.pivotSum(
        Seq("day_ts", "ubucket"), "event_type", eventTypes, "value",
        dropIncomplete = true)(
        Tables.events(s, d)
          .withColumn("day_ts", date_trunc("DAY", col("ts")))
          .withColumn("ubucket", col("user_id") % 20))
    },

    // A3: group-sum + pivot keyed by time only, incomplete rows kept
    // (EIA930PipelineHourlyData.py:134-142).
    QueryDef(
      "a3_pivot_hourly",
      ("""SELECT date_trunc('hour', ts) AS hour_ts,
        |""" + eventTypes.map(t =>
          s"  CAST(SUM(CASE WHEN event_type = '$t' THEN CAST(value AS DECIMAL(25,4)) END) AS DOUBLE) AS $t")
          .mkString(",\n") + """
        |FROM events GROUP BY 1 ORDER BY hour_ts""").stripMargin) { (s, d) =>
      EtlOps.pivotSum(Seq("hour_ts"), "event_type", eventTypes, "value",
        dropIncomplete = false)(
        Tables.events(s, d).withColumn("hour_ts", date_trunc("HOUR", col("ts"))))
    },

    // A4: per-group mean (computeMetricsPerStatePerHour 'mean',
    // OpenMeteoWeatherPipelineHourlyData.py:86-107). Exact-sum mean.
    QueryDef(
      "a4_group_mean",
      """SELECT date_trunc('day', ts) AS day_ts, event_type,
        |  CAST(SUM(CAST(value AS DECIMAL(25,4))) AS DOUBLE) / COUNT(value) AS mean_value
        |FROM events GROUP BY 1, 2 ORDER BY day_ts, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .withColumn("day_ts", date_trunc("DAY", col("ts")))
        .groupBy(col("day_ts"), col("event_type"))
        .agg(ExactAgg.meanExact(col("value")).as("mean_value"))
        .orderBy(col("day_ts"), col("event_type"))
    },

    // A5: per-group SAMPLE stddev (pandas Series.std is ddof=1 —
    // OpenMeteoWeatherPipelineHourlyData.py:100,167), from exact moments.
    QueryDef(
      "a5_group_std",
      """SELECT day_ts, event_type,
        |  CASE WHEN n > 1 THEN sqrt((n * s2 - s1 * s1) / (n * (n - 1.0))) END AS std_value
        |FROM (
        |  SELECT date_trunc('day', ts) AS day_ts, event_type,
        |    CAST(COUNT(value) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(25,4))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(value * value AS DECIMAL(30,8))) AS DOUBLE) AS s2
        |  FROM events GROUP BY 1, 2
        |) ORDER BY day_ts, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .withColumn("day_ts", date_trunc("DAY", col("ts")))
        .groupBy(col("day_ts"), col("event_type"))
        .agg(ExactAgg.stddevSampExact(col("value")).as("std_value"))
        .orderBy(col("day_ts"), col("event_type"))
    },

    // A-extension: ROLLUP — subtotal hierarchy the reference can't express;
    // one shuffle, grouping-sets expansion map-side.
    QueryDef(
      "a6_rollup",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(ExactAgg.sumExact(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // A-extension: explicit GROUPING SETS — hand-picked aggregation levels
    // (per-priority, per-status, grand total) in one pass, the general form
    // rollup/cube specialize. One shuffle; the Expand operator replicates
    // rows per set map-side.
    QueryDef(
      "a12_grouping_sets",
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,4))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")), Seq.empty),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(ExactAgg.sumExact(col("o_totalprice")).as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first)
    },

    // A-extension: CUBE — all grouping-set combinations.
    QueryDef(
      "a9_cube",
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,4))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          ExactAgg.sumExact(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // A-extension: distinct aggregation (exact; Spark plans it as a
    // two-phase expand + aggregate).
    QueryDef(
      "a7_count_distinct",
      """SELECT o_orderpriority,
        |  COUNT(DISTINCT o_custkey) AS n_customers,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },

    // F10: typed JSON decode — from_json with an explicit schema (the typed
    // sibling of p7's get_json_object path); malformed documents null out
    // instead of aborting under ANSI.
    QueryDef(
      "f10_json_struct",
      """SELECT event_id,
        |  TRY_CAST(CASE WHEN json_valid(j) THEN json_extract_string(j, '$.k') END
        |    AS BIGINT) AS k_typed
        |FROM (SELECT event_id,
        |        CASE WHEN event_id % 11 = 0 THEN '{broken' ELSE props END AS j
        |      FROM events)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      Tables.events(s, d)
        .withColumn("j",
          when(col("event_id") % 11 === 0, lit("{broken")).otherwise(col("props")))
        .select(col("event_id"),
          from_json(col("j"), StructType(Seq(StructField("k", LongType))))("k")
            .as("k_typed"))
        .orderBy(col("event_id"))
    },

    // Approximate aggregates (ApproxOps Scaladoc): the oracle hash-checks
    // the ACCURACY CONTRACT (exact anchor columns + a must-be-true bound
    // boolean), since sketch internals are engine-private.
    QueryDef(
      "ax1_approx_distinct",
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_exact, true AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      graft.operators.ApproxOps.distinctWithinTol(
        Tables.events(s, d), "event_type", "user_id", rsd = 0.02, tol = 0.05)
        .orderBy(col("event_type"))
    },

    QueryDef(
      "ax2_approx_quantile",
      """SELECT event_type, COUNT(value) AS n_values, true AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      graft.operators.ApproxOps.percentileWithinWindow(
        Tables.events(s, d), "event_type", "value",
        p = 0.5, lo = 0.45, hi = 0.55, accuracy = 10000)
        .orderBy(col("event_type"))
    },

    // Set ops: INTERSECT / EXCEPT (absent in the reference; §2e).
    QueryDef(
      "x1_set_ops",
      """SELECT 'both' AS tag, c_custkey FROM (
        |  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |UNION ALL
        |SELECT 'only_f' AS tag, c_custkey FROM (
        |  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |ORDER BY tag, c_custkey""".stripMargin) { (s, d) =>
      val f = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("c_custkey"))
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("c_custkey"))
      f.intersect(o).select(lit("both").as("tag"), col("c_custkey"))
        .unionByName(f.except(o).select(lit("only_f").as("tag"), col("c_custkey")))
        .orderBy(col("tag"), col("c_custkey"))
    },

    // X-extension: MULTISET set ops — INTERSECT ALL / EXCEPT ALL keep
    // duplicate cardinalities (a customer with 3 F-orders and 2 O-orders
    // appears twice in the intersection, once in the difference), the form
    // dedup accounting actually needs.
    QueryDef(
      "x1b_set_ops_all",
      """SELECT 'both_all' AS tag, c_custkey FROM (
        |  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |UNION ALL
        |SELECT 'only_f_all' AS tag, c_custkey FROM (
        |  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |ORDER BY tag, c_custkey""".stripMargin) { (s, d) =>
      val f = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("c_custkey"))
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("c_custkey"))
      f.intersectAll(o).select(lit("both_all").as("tag"), col("c_custkey"))
        .unionByName(f.exceptAll(o).select(lit("only_f_all").as("tag"), col("c_custkey")))
        .orderBy(col("tag"), col("c_custkey"))
    },

    // Multi-way analytics, Q3 shape: two fact tables joined on the shuffle
    // key, a broadcast dimension filter, grouped revenue, top-k. The shape a
    // 100 TB engine must plan well — selective dims broadcast BEFORE the
    // fact-fact shuffle, filters reach both scans, and the top-k is
    // TakeOrdered, not a global sort.
    QueryDef(
      "x2_topk_revenue",
      """SELECT o_orderkey, revenue, o_orderdate, o_orderpriority FROM (
        |  SELECT o_orderkey,
        |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4))) AS DOUBLE) AS revenue,
        |    o_orderdate, o_orderpriority
        |  FROM customer JOIN orders ON c_custkey = o_custkey
        |    JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE c_mktsegment = 'BUILDING'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |    AND l_shipdate > TIMESTAMP '1997-06-01'
        |  GROUP BY o_orderkey, o_orderdate, o_orderpriority)
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      val building = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .join(broadcast(building), col("o_custkey") === col("c_custkey"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1997-06-01").cast("timestamp"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(ExactAgg.sumExact(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .select(col("o_orderkey"), col("revenue"), col("o_orderdate"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)
    },

    // Multi-way analytics, Q5 shape: a six-table join (region -> nation ->
    // customer -> orders -> lineitem -> supplier) with the "local supplier"
    // twist — supplier matches on BOTH the lineitem key and the customer's
    // nation. One fact-fact shuffle (lineitem x orders); every dimension
    // broadcasts.
    QueryDef(
      "x3_region_revenue",
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM region JOIN nation ON n_regionkey = r_regionkey
        |  JOIN customer ON c_nationkey = n_nationkey
        |  JOIN orders ON o_custkey = c_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1999-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      val asiaNations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .join(broadcast(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      Tables.lineitem(s, d)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey") &&
            col("s_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(ExactAgg.sumExact(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // W-extension: resample onto an hourly grid with forward-fill — the
    // gap-filling step for hourly feeds that skip hours. Grid is generated
    // (keys x 168 slots over one week), latest-per-slot wins (ts then
    // event_id), fill is last(ignoreNulls) over slot order.
    QueryDef(
      "ts1_resample_ffill",
      """WITH grid AS (
        |  SELECT user_id, 1704067200000000 + 3600000000 * g.i AS slot
        |  FROM (SELECT DISTINCT user_id FROM events),
        |       (SELECT unnest(generate_series(0, 167)) AS i) g),
        |obs AS (
        |  SELECT user_id,
        |    (epoch_us(ts) // 3600000000) * 3600000000 AS slot, value,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY user_id, epoch_us(ts) // 3600000000
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |  WHERE ts >= make_timestamp(1704067200000000)
        |    AND ts < make_timestamp(1704672000000000)),
        |o1 AS (SELECT user_id, slot, value FROM obs WHERE rn = 1)
        |SELECT g.user_id, make_timestamp(g.slot) AS ts,
        |  LAST_VALUE(o1.value IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.slot
        |    ROWS UNBOUNDED PRECEDING) AS value
        |FROM grid g LEFT JOIN o1 ON g.user_id = o1.user_id AND g.slot = o1.slot
        |ORDER BY g.user_id, ts""".stripMargin) { (s, d) =>
      EtlOps.resampleFfill(Tables.events(s, d), "user_id", "ts", "event_id",
        Seq("value"),
        new java.sql.Timestamp(1704067200000L),  // 2024-01-01T00Z
        new java.sql.Timestamp(1704672000000L),  // 2024-01-08T00Z
        stepSeconds = 3600)
        .orderBy(col("user_id"), col("ts"))
    },

    // TS-extension: gap fill by LINEAR INTERPOLATION between slot anchors
    // (EtlOps.resampleInterp) — between anchors the exact blend, ffill after
    // the last, NULL before the first. The blend is integer slot deltas and
    // two anchor doubles in one fixed expression, bit-equal across engines.
    QueryDef(
      "ts2_resample_interp",
      """WITH grid AS (
        |  SELECT user_id, 1704067200000000 + 3600000000 * g.i AS slot
        |  FROM (SELECT DISTINCT user_id FROM events),
        |       (SELECT unnest(generate_series(0, 167)) AS i) g),
        |obs AS (
        |  SELECT user_id,
        |    (epoch_us(ts) // 3600000000) * 3600000000 AS slot, value,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY user_id, epoch_us(ts) // 3600000000
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |  WHERE ts >= make_timestamp(1704067200000000)
        |    AND ts < make_timestamp(1704672000000000)),
        |o1 AS (SELECT user_id, slot, value FROM obs WHERE rn = 1),
        |j AS (SELECT g.user_id, g.slot, o1.value AS v,
        |    LAST_VALUE(o1.value IGNORE NULLS) OVER (
        |      PARTITION BY g.user_id ORDER BY g.slot
        |      ROWS UNBOUNDED PRECEDING) AS pv,
        |    LAST_VALUE(CASE WHEN o1.value IS NOT NULL THEN g.slot END IGNORE NULLS)
        |      OVER (PARTITION BY g.user_id ORDER BY g.slot
        |        ROWS UNBOUNDED PRECEDING) AS ps,
        |    FIRST_VALUE(o1.value IGNORE NULLS) OVER (
        |      PARTITION BY g.user_id ORDER BY g.slot
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    FIRST_VALUE(CASE WHEN o1.value IS NOT NULL THEN g.slot END IGNORE NULLS)
        |      OVER (PARTITION BY g.user_id ORDER BY g.slot
        |        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ns
        |  FROM grid g LEFT JOIN o1 ON g.user_id = o1.user_id AND g.slot = o1.slot)
        |SELECT user_id, make_timestamp(slot) AS ts,
        |  CASE WHEN ps = ns THEN pv
        |       WHEN ps IS NOT NULL AND ns IS NOT NULL THEN
        |         pv + (nv - pv) * (CAST(slot - ps AS DOUBLE) / CAST(ns - ps AS DOUBLE))
        |       WHEN ps IS NOT NULL THEN pv
        |       ELSE NULL END AS value
        |FROM j ORDER BY user_id, ts""".stripMargin) { (s, d) =>
      EtlOps.resampleInterp(Tables.events(s, d), "user_id", "ts", "event_id",
        "value",
        new java.sql.Timestamp(1704067200000L),
        new java.sql.Timestamp(1704672000000L),
        stepSeconds = 3600)
        .orderBy(col("user_id"), col("ts"))
    },

    // TS-extension: OHLC bar resampling — per (event_type, hour) the open
    // (value at the earliest (ts, event_id)), close (latest), low, high
    // and count: the financial-style downsample an hourly metrics rollup
    // is. Open/close ride min_by/max_by on the (ts, event_id) struct key —
    // ONE map-side-combinable aggregate, no window, no self-join; the
    // unique event_id tiebreak makes both picks engine-deterministic. The
    // oracle mirrors with rank-1 rows under both sort directions.
    QueryDef(
      "ts3_ohlc_bars",
      """WITH r AS (SELECT event_type, date_trunc('hour', ts) AS hour_start,
        |    value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
        |      ORDER BY ts, event_id) AS ra,
        |    ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
        |      ORDER BY ts DESC, event_id DESC) AS rd
        |  FROM events)
        |SELECT event_type, hour_start,
        |  MIN(CASE WHEN ra = 1 THEN value END) AS open,
        |  MIN(CASE WHEN rd = 1 THEN value END) AS close,
        |  MIN(value) AS low, MAX(value) AS high,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM r GROUP BY event_type, hour_start
        |ORDER BY event_type, hour_start""".stripMargin) { (s, d) =>
      graft.operators.EventOps.ohlcBars(Tables.events(s, d), "event_type",
          "ts", "event_id", "value")
        .orderBy(col("event_type"), col("hour_start"))
    },

    // Q-extension: per-column dataset profile — row/null/distinct counts and
    // min/max rendered as strings, one row per column, one shared scan.
    QueryDef(
      "dp1_profile",
      ("""SELECT * FROM (""" +
        Seq("l_quantity", "l_returnflag", "l_shipdate").map(c =>
          s"""SELECT '$c' AS "column", COUNT(*) AS n_rows,
             |  COUNT(CASE WHEN $c IS NULL THEN 1 END) AS n_nulls,
             |  COUNT(DISTINCT $c) AS n_distinct,
             |  CAST(MIN($c) AS VARCHAR) AS min_s,
             |  CAST(MAX($c) AS VARCHAR) AS max_s FROM lineitem""".stripMargin)
          .mkString("\nUNION ALL\n") +
        """) ORDER BY "column"""").stripMargin) { (s, d) =>
      graft.operators.Quality.profile(Tables.lineitem(s, d),
        Seq("l_quantity", "l_returnflag", "l_shipdate"))
        .orderBy(col("column"))
    },

    // Q-extension: data-quality expectation gate — violation counts for
    // named rules in one scan; rules chosen so at least one fires.
    QueryDef(
      "dq1_expectations",
      """SELECT 'qty_le_49' AS rule,
        |  COUNT(CASE WHEN NOT coalesce(l_quantity <= 49, false) THEN 1 END)
        |    AS n_violations,
        |  CAST(COUNT(CASE WHEN NOT coalesce(l_quantity <= 49, false) THEN 1 END)
        |    AS DOUBLE) / greatest(CAST(COUNT(*) AS DOUBLE), 1.0) AS violation_rate
        |FROM lineitem
        |UNION ALL
        |SELECT 'price_positive',
        |  COUNT(CASE WHEN NOT coalesce(l_extendedprice > 0, false) THEN 1 END),
        |  CAST(COUNT(CASE WHEN NOT coalesce(l_extendedprice > 0, false) THEN 1 END)
        |    AS DOUBLE) / greatest(CAST(COUNT(*) AS DOUBLE), 1.0)
        |FROM lineitem
        |UNION ALL
        |SELECT 'shipdate_present',
        |  COUNT(CASE WHEN NOT coalesce(l_shipdate IS NOT NULL, false) THEN 1 END),
        |  CAST(COUNT(CASE WHEN NOT coalesce(l_shipdate IS NOT NULL, false) THEN 1 END)
        |    AS DOUBLE) / greatest(CAST(COUNT(*) AS DOUBLE), 1.0)
        |FROM lineitem
        |ORDER BY rule""".stripMargin) { (s, d) =>
      graft.operators.Quality.expect(Tables.lineitem(s, d), Seq(
        "qty_le_49" -> (col("l_quantity") <= 49),
        "price_positive" -> (col("l_extendedprice") > 0),
        "shipdate_present" -> col("l_shipdate").isNotNull))
        .orderBy(col("rule"))
    },

    // DQ-extension: the schema-drift gate as AN ORACLE-CHECKED QUERY
    // (Quality.schemaDrift was spec-only — VERDICT r7 ask #8). The contract
    // deliberately drifts from lineitem's real schema in all four ways the
    // gate detects; the oracle derives the ACTUAL schema from DuckDB's
    // information_schema over the same parquet (type names mapped to
    // Spark's simpleString vocabulary), so the report is schema-driven on
    // both sides, not a constant.
    QueryDef(
      "dq2_schema_drift",
      """WITH actual AS (
        |  SELECT column_name AS col,
        |    CASE lower(data_type)
        |      WHEN 'varchar' THEN 'string'
        |      WHEN 'integer' THEN 'int'
        |      WHEN 'timestamp' THEN 'timestamp_ntz'
        |      ELSE lower(data_type) END AS typ
        |  FROM information_schema.columns WHERE table_name = 'lineitem'),
        |expected(col, typ, required) AS (VALUES
        |  ('l_orderkey', 'bigint', true),
        |  ('l_partkey', 'bigint', false),
        |  ('l_suppkey', 'bigint', false),
        |  ('l_linenumber', 'int', false),
        |  ('l_quantity', 'decimal(12,2)', false),
        |  ('l_extendedprice', 'double', false),
        |  ('l_discount', 'double', false),
        |  ('l_commitdate', 'date', false),
        |  ('l_returnflag', 'string', false),
        |  ('l_linestatus', 'string', false),
        |  ('l_shipdate', 'timestamp_ntz', false))
        |SELECT drift, "column", actual, expected FROM (
        |  SELECT 'added' AS drift, a.col AS "column", a.typ AS actual,
        |    CAST(NULL AS VARCHAR) AS expected
        |  FROM actual a WHERE a.col NOT IN (SELECT col FROM expected)
        |  UNION ALL
        |  SELECT 'missing', e.col, CAST(NULL AS VARCHAR), e.typ
        |  FROM expected e WHERE e.col NOT IN (SELECT col FROM actual)
        |  UNION ALL
        |  SELECT 'type_changed', e.col, a.typ, e.typ
        |  FROM expected e JOIN actual a ON a.col = e.col WHERE a.typ <> e.typ
        |  UNION ALL
        |  SELECT 'nullability_relaxed', e.col, 'nullable', 'required'
        |  FROM expected e JOIN actual a ON a.col = e.col WHERE e.required)
        |ORDER BY drift, "column"""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types._
      val contract = StructType(Seq(
        StructField("l_orderkey", LongType, nullable = false),
        StructField("l_partkey", LongType),
        StructField("l_suppkey", LongType),
        StructField("l_linenumber", IntegerType),
        StructField("l_quantity", DecimalType(12, 2)),
        StructField("l_extendedprice", DoubleType),
        StructField("l_discount", DoubleType),
        StructField("l_commitdate", DateType),
        StructField("l_returnflag", StringType),
        StructField("l_linestatus", StringType),
        StructField("l_shipdate", TimestampNTZType)))
      graft.operators.Quality.schemaDrift(Tables.lineitem(s, d), contract)
        .orderBy(col("drift"), col("column"))
    },

    // DQ-extension: robust median/MAD outlier gate (Quality.madOutlierGate)
    // per event_type over value — the 50%-breakdown detector a mean/stddev
    // gate isn't (one extreme value inflates stddev until the gate stops
    // firing). Exact interpolated percentiles chain med -> MAD -> count on
    // raw doubles (the a8 discipline), rounding display-only, so counts,
    // stats, and the gate boolean all hash-match.
    QueryDef(
      "dq4_mad_outliers",
      """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |ad AS (SELECT e.event_type, m.med, abs(e.value - m.med) AS ad
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(ad, 0.5) AS mad
        |  FROM ad GROUP BY 1)
        |SELECT a.event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  round(MAX(a.med), 6) AS med, round(MAX(m2.mad), 6) AS mad,
        |  CAST(SUM(CASE WHEN a.ad > 5.0 * m2.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers,
        |  round(CAST(SUM(CASE WHEN a.ad > 5.0 * m2.mad THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*), 6) AS outlier_frac,
        |  (CAST(SUM(CASE WHEN a.ad > 5.0 * m2.mad THEN 1 ELSE 0 END) AS DOUBLE)
        |    / COUNT(*)) <= 0.02 AS gate_ok
        |FROM ad a JOIN mad m2 USING (event_type)
        |GROUP BY a.event_type ORDER BY a.event_type""".stripMargin) { (s, d) =>
      graft.operators.Quality.madOutlierGate(
        Tables.events(s, d), "event_type", "value",
        nSigma = 5.0, maxOutlierFrac = 0.02)
        .orderBy(col("event_type"))
    },

    // DQ-extension: REFERENTIAL-integrity audit (Quality.
    // referentialIntegrity — the dbt-style relationship test): orphan and
    // null-key counts for the warehouse's three FK edges, plus the same
    // orders→customer edge against a half-missing "stale dimension
    // snapshot" (c_custkey % 2 = 0) so the orphan branch provably fires —
    // the gate a nightly dim refresh runs before exposing joins. Each
    // relationship is one key-only anti join; zero orphans on the live
    // edges IS the result.
    QueryDef(
      "dq5_referential_integrity",
      """SELECT 'lineitem_orders' AS relationship,
        |  CAST(COUNT(*) AS BIGINT) AS n_child,
        |  CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_null_keys,
        |  CAST(SUM(CASE WHEN l_orderkey IS NOT NULL AND o_orderkey IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
        |FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |  ON l_orderkey = o_orderkey
        |UNION ALL
        |SELECT 'lineitem_supplier', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(SUM(CASE WHEN l_suppkey IS NOT NULL AND s_suppkey IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT)
        |FROM lineitem LEFT JOIN (SELECT DISTINCT s_suppkey FROM supplier) s
        |  ON l_suppkey = s_suppkey
        |UNION ALL
        |SELECT 'orders_customer', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(SUM(CASE WHEN o_custkey IS NOT NULL AND c_custkey IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |  ON o_custkey = c_custkey
        |UNION ALL
        |SELECT 'orders_customer_stale', CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(SUM(CASE WHEN o_custkey IS NOT NULL AND c_custkey IS NULL
        |    THEN 1 ELSE 0 END) AS BIGINT)
        |FROM orders LEFT JOIN
        |  (SELECT DISTINCT c_custkey FROM customer WHERE c_custkey % 2 = 0) c
        |  ON o_custkey = c_custkey
        |ORDER BY relationship""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val ord = Tables.orders(s, d)
      val cust = Tables.customer(s, d)
      graft.operators.Quality.referentialIntegrity(Seq(
        ("lineitem_orders", li, "l_orderkey", ord, "o_orderkey"),
        ("lineitem_supplier", li, "l_suppkey", Tables.supplier(s, d), "s_suppkey"),
        ("orders_customer", ord, "o_custkey", cust, "c_custkey"),
        ("orders_customer_stale", ord, "o_custkey",
          cust.filter(col("c_custkey") % 2 === 0), "c_custkey")))
        .orderBy(col("relationship"))
    },

    // DQ-extension: UNIQUE-key audit (Quality.uniqueKeys — dbt's `unique`
    // test, dq5's sibling): primary keys of orders and the
    // (l_orderkey, l_linenumber) composite are clean; the documents TEXT
    // fingerprint rule fires (the corpus ships duplicates — d2's finding
    // restated as a key-constraint violation). n_extra_rows = the rows a
    // dedup would remove.
    QueryDef(
      "dq6_unique_keys",
      """SELECT 'orders_pk' AS rule, CAST(SUM(n) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
        |  CAST(SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT)
        |    AS n_extra_rows
        |FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders GROUP BY 1)
        |UNION ALL
        |SELECT 'lineitem_pk', CAST(SUM(n) AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT)
        |FROM (SELECT l_orderkey, l_linenumber, COUNT(*) AS n
        |      FROM lineitem GROUP BY 1, 2)
        |UNION ALL
        |SELECT 'documents_text_fp', CAST(SUM(n) AS BIGINT), CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(SUM(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT)
        |FROM (SELECT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))),
        |        COUNT(*) AS n
        |      FROM documents GROUP BY 1)
        |ORDER BY rule""".stripMargin) { (s, d) =>
      graft.operators.Quality.uniqueKeys(Seq(
          ("orders_pk", Tables.orders(s, d), Seq("o_orderkey")),
          ("lineitem_pk", Tables.lineitem(s, d),
            Seq("l_orderkey", "l_linenumber")),
          ("documents_text_fp",
            Tables.documents(s, d).select(
              graft.operators.TextOps.fingerprint(col("text")).as("fp")),
            Seq("fp"))))
        .orderBy(col("rule"))
    },

    // DQ-extension: DISTRIBUTION-drift gate (Quality.distributionDrift —
    // VERDICT r8 ask #7): dq1 gates rows, dq2 the schema, dq3 the SHAPE.
    // Two scenarios against the same reference run (even orderkeys):
    // `a_split` compares the odd-orderkey half — same distribution, every
    // gate passes — and `b_price_shifted` compares a price-truncated
    // candidate run, which must fire on o_totalprice (measured TV 0.297 vs
    // the 0.100 budget) while the independent categorical columns stay
    // green. Histogram TV is exact-integer arithmetic end-to-end
    // (|c_ref*n_cur - c_cur*n_ref| summed, gate compared in integers), KMV
    // cardinality uses the deterministic ax3 bottom-k estimate, so every
    // value AND the booleans hash-match the oracle.
    QueryDef(
      "dq3_distribution_drift",
      Seq(("a_split", "o_orderkey % 2 = 1"),
          ("b_price_shifted", "o_orderkey % 2 = 1 AND o_totalprice >= 150000"))
        .flatMap { case (scen, cond) =>
          Seq(
            ("o_orderpriority", "o_orderpriority", "o_orderpriority"),
            ("o_orderstatus", "o_orderstatus", "o_orderstatus"),
            ("o_totalprice",
              "CAST(CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS VARCHAR)",
              "CAST(CAST(floor(o_totalprice * 100.0) AS BIGINT) AS VARCHAR)"))
            .map { case (cn, bexpr, kexpr) => dq3Block(scen, cond, cn, bexpr, kexpr) }
        }.mkString("", "\nUNION ALL\n", "\nORDER BY scenario, \"column\"")) { (s, d) =>
      val o = Tables.orders(s, d)
      val ref = o.filter(col("o_orderkey") % 2 === 0)
      val curSplit = o.filter(col("o_orderkey") % 2 === 1)
      val curShift = curSplit.filter(col("o_totalprice") >= 150000)
      val cols = Seq(
        ("o_orderpriority", col("o_orderpriority"), col("o_orderpriority")),
        ("o_orderstatus", col("o_orderstatus"), col("o_orderstatus")),
        ("o_totalprice", floor(col("o_totalprice") / lit(50000.0)),
          floor(col("o_totalprice") * lit(100.0)).cast("string")))
      def run(scen: String, cur: org.apache.spark.sql.DataFrame) = {
        val dd = graft.operators.Quality.distributionDrift(ref, cur, cols)
        dd.select(lit(scen).as("scenario") +: dd.columns.map(col): _*)
      }
      run("a_split", curSplit).unionByName(run("b_price_shifted", curShift))
        .orderBy(col("scenario"), col("column"))
    },

    // A-extension: incremental aggregate maintenance — a persisted per-key
    // (sum, count) aggregate combined with a delta batch's aggregate equals
    // the full recompute (the oracle). Algebraic partials make the combine
    // exact under any split of the data.
    QueryDef(
      "a11_incremental_agg",
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      def part(pred: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame =
        Tables.lineitem(s, d).filter(pred)
          .groupBy(col("l_returnflag"))
          .agg(ExactAgg.sumExact(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n"))
      graft.operators.Quality.refreshSumCount(
        part(col("l_orderkey") % 5 =!= 4), // the "materialized" aggregate
        part(col("l_orderkey") % 5 === 4), // the delta batch's aggregate
        Seq("l_returnflag"), "sum_qty", "n")
        .orderBy(col("l_returnflag"))
    },

    // X-extension: SALTED two-phase aggregation — the skew-mitigation path
    // for a hot key owning a reducer. The oracle is the PLAIN one-phase
    // GROUP BY: a hash match proves the salted plan is result-identical
    // (decimal-exact partials make it independent of partitioning).
    QueryDef(
      "sk1_salted_agg",
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE)
        |    AS sum_l_quantity,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      graft.operators.Salting.saltedSumCount(
        Tables.lineitem(s, d), Seq("l_returnflag"), "l_quantity", buckets = 16)
        .orderBy(col("l_returnflag"))
    },

    // X-extension: SALTED LEFT-OUTER join (Salting.saltedJoinOuter) — the
    // skewed ENRICHMENT join. The oracle is the PLAIN left join: a hash
    // match proves the salted plan is row-identical — every probe row
    // survives exactly once, matched multiplicity is unchanged, and an
    // unmatched row null-extends exactly once (a per-replica null-extension
    // bug would inflate n_unmatched by the bucket count; a replication bug
    // would inflate n_rows). Build side filtered to high-priority orders so
    // unmatched probe rows actually exist.
    QueryDef(
      "sk2_salted_outer_join",
      """SELECT l_returnflag,
        |  COUNT(*) AS n_rows,
        |  COUNT(o_orderdate) AS n_matched,
        |  CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unmatched
        |FROM lineitem LEFT JOIN (
        |  SELECT o_orderkey, o_orderdate FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) o
        |  ON o_orderkey = l_orderkey
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val build = Tables.orders(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_orderkey"), col("o_orderdate"))
      graft.operators.Salting.saltedJoinOuter(
          Tables.lineitem(s, d), build, "l_orderkey", "o_orderkey",
          buckets = 16)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("o_orderdate")).as("n_matched"),
          sum(when(col("o_orderdate").isNull, 1L).otherwise(0L))
            .as("n_unmatched"))
        .orderBy(col("l_returnflag"))
    },

    // W-extension: PARETO / contribution report — each category's share
    // of the total and the running cumulative share in descending order
    // (the 80/20 readout every cost/revenue dashboard ships). Exact
    // decimal sums; shares are single divisions under round-6. The
    // cumulative window is GLOBAL but CATEGORY-bounded (it runs over the
    // per-type aggregate, a handful of rows — the fts3 documented-bounded
    // window class, not a row-sized sort).
    QueryDef(
      "w14_pareto_share",
      """WITH g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(value AS DECIMAL(25,4))) AS svd FROM events GROUP BY 1),
        |t AS (SELECT SUM(svd) AS tot FROM g),
        |c AS (SELECT event_type, n, svd,
        |    SUM(svd) OVER (ORDER BY svd DESC, event_type
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM g)
        |SELECT event_type, n, CAST(svd AS DOUBLE) AS sum_value,
        |  round(CAST(svd AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS share,
        |  round(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS cum_share
        |FROM c, t ORDER BY sum_value DESC, event_type""".stripMargin) { (s, d) =>
      val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(25, 4)
      val g = Tables.events(s, d).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value").cast(dec)).as("svd"))
      val tot = g.agg(sum(col("svd")).as("tot"))
      val w = Window.orderBy(col("svd").desc, col("event_type"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.withColumn("cum", sum(col("svd")).over(w))
        .crossJoin(broadcast(tot))
        .select(col("event_type"), col("n"),
          col("svd").cast("double").as("sum_value"),
          round(col("svd").cast("double") / col("tot").cast("double"), 6)
            .as("share"),
          round(col("cum").cast("double") / col("tot").cast("double"), 6)
            .as("cum_share"))
        .orderBy(col("sum_value").desc, col("event_type"))
    },

    // A-extension: UNPIVOT/melt (the inverse of a2/a3's pivot — the
    // wide→long reshape every metrics pipeline needs before a generic
    // per-measure aggregate): four lineitem measures melt to
    // (measure, value) rows via Spark's native unpivot (ONE Expand node —
    // map-side replication, no union-of-scans), then an exact-decimal
    // rollup per (returnflag, measure). The oracle spells the same melt
    // as a UNION ALL — different plan, same rows.
    QueryDef(
      "a18_unpivot_measures",
      """SELECT l_returnflag, measure, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(25,4))) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT l_returnflag, 'l_quantity' AS measure,
        |      CAST(l_quantity AS DOUBLE) AS value FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_extendedprice', l_extendedprice
        |    FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_discount', l_discount
        |    FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"),
          col("l_quantity").cast("double").as("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "value")
        .groupBy(col("l_returnflag"), col("measure"))
        .agg(count(lit(1)).as("n"), ExactAgg.sumExact(col("value")).as("sum_value"))
        .orderBy(col("l_returnflag"), col("measure"))
    },

    // SK-extension: skew DIAGNOSIS report (Salting.skewReport) — the
    // measurement that decides whether sk1/sk2 (or AQE alone) are needed:
    // per-key count extremes, exact lower-median and p99 counts (two-level
    // bucket walk, never a global sort of the count table), max/median
    // skew ratio and the ceil(max/p99) salt factor. All integers; hot-key
    // ties to the smallest key. Run BEFORE the 100 TB join, not after the
    // straggler.
    QueryDef(
      "sk3_skew_report",
      """WITH c AS (SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |s AS (SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
        |    CAST(COUNT(*) AS BIGINT) AS n_keys, MAX(n) AS max_count FROM c),
        |hot AS (SELECT k AS hot_key FROM c ORDER BY n DESC, k LIMIT 1),
        |r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n) AS rn FROM c),
        |med AS (SELECT n AS median_count FROM r, s
        |  WHERE rn = (n_keys + 1) // 2),
        |p99 AS (SELECT n AS p99_count FROM r, s
        |  WHERE rn = (99 * n_keys + 99) // 100)
        |SELECT n_rows, n_keys, hot_key, max_count, median_count, p99_count,
        |  (max_count * 100) // median_count AS skew_x100,
        |  (max_count + p99_count - 1) // p99_count AS salt_factor
        |FROM s, hot, med, p99""".stripMargin) { (s, d) =>
      graft.operators.Salting.skewReport(Tables.events(s, d), "user_id")
    },

    // X-extension, TPC-H Q17 shape: correlated scalar-subquery (per-part
    // average quantity) DECORRELATED into an aggregate + join — the plan
    // rewrite every optimizer must get right. Exact decimal sums before the
    // single double division keep both engines bit-identical.
    QueryDef(
      "x4_small_qty_revenue",
      """WITH pq AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) / COUNT(*)
        |      AS avg_qty
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,4))) AS DOUBLE) / 7.0
        |    AS avg_yearly
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |  JOIN pq ON pq.l_partkey = lineitem.l_partkey
        |WHERE p_size <= 5 AND l_quantity < 0.2 * avg_qty""".stripMargin) { (s, d) =>
      val pq = Tables.lineitem(s, d).groupBy(col("l_partkey").as("pq_partkey"))
        .agg((ExactAgg.sumExact(col("l_quantity")) / count(lit(1))).as("avg_qty"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_size") <= 5)
          .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
        .join(pq, col("l_partkey") === col("pq_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((ExactAgg.sumExact(col("l_extendedprice")) / 7.0).as("avg_yearly"))
    },

    // X-extension, TPC-H Q13 shape: per-customer order counts INCLUDING the
    // zero bucket (left join before the double aggregation) -> histogram.
    QueryDef(
      "x5_order_distribution",
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // ---- §2c joins --------------------------------------------------------

    // J1: left-semi join against a filtered dimension
    // (EIA930PipelineHourlyData.py:104-106). Dim broadcasts — no fact shuffle.
    QueryDef(
      "j1_semi_join",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      EtlOps.semiJoinFilter(
        Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING"),
        "o_custkey", "c_custkey")(Tables.orders(s, d))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    // J2: broadcast equi-join dim->fact then aggregate
    // (the J2 coordinates->state rewrite, OpenMeteo…:94-103, on part/lineitem).
    QueryDef(
      "j2_broadcast_join_agg",
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(ExactAgg.sumExact(col("l_quantity")).as("sum_qty"),
             count(lit(1)).as("n_items"))
        .orderBy(col("p_brand"))
    },

    // J-extension: left-anti join (customers with no orders) — the dual of J1,
    // needed constantly in data-pipeline hygiene.
    QueryDef(
      "j3_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.orders(s, d).select(col("o_custkey"))),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // J-extension: as-of (point-in-time) join — each event picks the latest
    // order of that user at or before the event time. Right side deduped per
    // (key, ts) so "latest" is well-defined in both engines.
    QueryDef(
      "j4_asof_join",
      """WITH r AS (SELECT * FROM (
        |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
        |      ORDER BY o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1)
        |SELECT event_id, user_id, o_orderkey, o_totalprice
        |FROM events ASOF LEFT JOIN r
        |  ON user_id = r.o_custkey AND ts >= r.o_orderdate
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey").desc)
      val ordersDedup = Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") === 1).drop("rn")
      graft.operators.AsOfJoin.asOf(
        Tables.events(s, d), ordersDedup,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTs = "ts", rightTs = "o_orderdate",
        rightValues = Seq("o_orderkey", "o_totalprice"))
        .select(col("event_id"), col("user_id"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("event_id"))
    },

    // J-extension: as-of join with NULLABLE right values — every third
    // order's price is nulled, and the latest order's null must surface
    // verbatim (a per-column last(ignoreNulls) carry would resurrect an
    // older order's price; this query exists to pin the struct-carry fix).
    QueryDef(
      "j4b_asof_null_values",
      """WITH r0 AS (SELECT o_custkey, o_orderdate, o_orderkey,
        |    CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END
        |      AS o_totalprice
        |  FROM orders),
        |r AS (SELECT * FROM (
        |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
        |      ORDER BY o_orderkey DESC) AS rn
        |  FROM r0) WHERE rn = 1)
        |SELECT event_id, user_id, o_orderkey, o_totalprice
        |FROM events ASOF LEFT JOIN r
        |  ON user_id = r.o_custkey AND ts >= r.o_orderdate
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey").desc)
      val ordersNulled = Tables.orders(s, d)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 3 === 0, lit(null)).otherwise(col("o_totalprice")))
        .withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") === 1).drop("rn")
      graft.operators.AsOfJoin.asOf(
        Tables.events(s, d), ordersNulled,
        leftKey = "user_id", rightKey = "o_custkey",
        leftTs = "ts", rightTs = "o_orderdate",
        rightValues = Seq("o_orderkey", "o_totalprice"))
        .select(col("event_id"), col("user_id"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("event_id"))
    },

    // J-extension: interval (equi + range) join — lineitems shipped within
    // 60 days of their order's date. The equi key keeps it a hash join with
    // the range as a residual predicate — no nested-loop blowup.
    QueryDef(
      "j5_interval_join",
      """SELECT o_orderkey, COUNT(*) AS n_shipped,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS sum_qty
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  AND l_shipdate >= o_orderdate
        |  AND l_shipdate < o_orderdate + INTERVAL 60 DAY
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).join(Tables.lineitem(s, d),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_shipped"),
          ExactAgg.sumExact(col("l_quantity")).as("sum_qty"))
        .orderBy(col("o_orderkey"))
    },

    // J-extension: LEFT-OUTER attribution interval join — the hash-checked
    // batch twin of the streaming attributeJoinOuter (EventStreams), which
    // EventStreamsSpec proves emits the same rows micro-batched. Every view
    // is a result; purchases by the same user within the 1-hour horizon
    // attach, funnel drops carry NULLs. The equi key keeps it a hash join
    // with the time range as a residual — same plan discipline as j5.
    QueryDef(
      "j5b_attribution_outer",
      """SELECT v.event_id AS view_id, v.user_id AS user_id,
        |  p.event_id AS purchase_id
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'view') v
        |LEFT JOIN (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'purchase') p
        |  ON p.user_id = v.user_id AND p.ts >= v.ts
        |    AND p.ts <= v.ts + INTERVAL 1 HOUR
        |ORDER BY view_id, purchase_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      graft.streaming.EventStreams.attributeJoinOuter(
        ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts")),
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts")),
        "user_id", "ts", "1 hour")
        .select(col("l_event_id").as("view_id"), col("l_user_id").as("user_id"),
          col("r_event_id").as("purchase_id"))
        .orderBy(col("view_id"), col("purchase_id"))
    },

    // J-extension: FORWARD as-of with tolerance — each event's next event
    // of the same user (strictly later via a +1us probe), surfaced only if
    // within 1 hour. Engine tolerance is 1h measured from the ORIGINAL ts
    // (3_600_000_000 - 1 from the shifted probe), matching the oracle's
    // `r_ts - ts <= INTERVAL 1 HOUR` exactly.
    QueryDef(
      "j4c_asof_forward_tol",
      """WITH r AS (SELECT * FROM (
        |  SELECT user_id AS r_uid, ts AS r_ts, event_id AS r_eid,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |      ORDER BY event_id DESC) AS rn
        |  FROM events) WHERE rn = 1)
        |SELECT event_id, user_id,
        |  CASE WHEN r_ts - ts <= INTERVAL 1 HOUR THEN r_eid END
        |    AS next_event_id
        |FROM events ASOF LEFT JOIN r
        |  ON user_id = r_uid AND ts + INTERVAL 1 MICROSECOND <= r_ts
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id"), col("ts"))
        .orderBy(col("event_id").desc)
      val rightEvents = Tables.events(s, d)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id").as("r_uid"), col("ts").as("r_ts"),
          col("event_id").as("r_eid"))
      val probes = Tables.events(s, d)
        .withColumn("probe_ts", col("ts") + expr("INTERVAL 1 MICROSECOND"))
      graft.operators.AsOfJoin.asOf(
        probes, rightEvents,
        leftKey = "user_id", rightKey = "r_uid",
        leftTs = "probe_ts", rightTs = "r_ts",
        rightValues = Seq("r_eid"),
        direction = "forward",
        toleranceMicros = Some(3600000000L - 1))
        .select(col("event_id"), col("user_id"), col("r_eid").as("next_event_id"))
        .orderBy(col("event_id"))
    },

    // J-extension: NEAREST-timestamp join (AsOfJoin.nearest) — each odd
    // event matched to the closest even event of the same user in EITHER
    // direction (ties backward). Both carries come from one exchange and
    // one per-key sort; the oracle derives backward/forward candidates by
    // correlated min/max and picks the nearer with the same tie rule.
    QueryDef(
      "j8_nearest_join",
      """WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_id % 2 = 1),
        |r AS (SELECT * FROM (
        |  SELECT user_id AS r_uid, ts AS r_ts, event_id AS r_eid,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, ts
        |      ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_id % 2 = 0) WHERE rn = 1),
        |cand AS (SELECT l.event_id, l.user_id, l.ts,
        |    (SELECT max(r_ts) FROM r WHERE r_uid = l.user_id AND r_ts <= l.ts) AS bts,
        |    (SELECT min(r_ts) FROM r WHERE r_uid = l.user_id AND r_ts > l.ts) AS fts
        |  FROM l),
        |pick AS (SELECT event_id, user_id, ts,
        |    CASE WHEN bts IS NULL THEN fts
        |         WHEN fts IS NULL THEN bts
        |         WHEN (fts - ts) < (ts - bts) THEN fts ELSE bts END AS mts
        |  FROM cand)
        |SELECT p.event_id, p.user_id, r.r_eid AS nearest_event_id
        |FROM pick p LEFT JOIN r ON r.r_uid = p.user_id AND r.r_ts = p.mts
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id"), col("ts"))
        .orderBy(col("event_id").desc)
      val rightEvents = Tables.events(s, d).filter(col("event_id") % 2 === 0)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id").as("r_uid"), col("ts").as("r_ts"),
          col("event_id").as("r_eid"))
      graft.operators.AsOfJoin.nearest(
        Tables.events(s, d).filter(col("event_id") % 2 === 1)
          .select(col("event_id"), col("user_id"), col("ts")),
        rightEvents,
        leftKey = "user_id", rightKey = "r_uid",
        leftTs = "ts", rightTs = "r_ts",
        rightValues = Seq("r_eid"))
        .select(col("event_id"), col("user_id"), col("r_eid").as("nearest_event_id"))
        .orderBy(col("event_id"))
    },

    // J-extension: range join WITHOUT an equi key (the shape Spark would
    // nested-loop): orders whose date falls inside a 7-day post-shipment
    // window of any heavy lineitem. Engine uses the banded rewrite (one
    // hash shuffle on band ids + residual filter); oracle is the naive
    // BETWEEN join. PlanSpec asserts no nested-loop/cartesian survives.
    QueryDef(
      "j7_range_join_banded",
      """SELECT o_orderkey, COUNT(*) AS n_windows
        |FROM orders JOIN (
        |  SELECT l_shipdate FROM lineitem WHERE l_quantity >= 45) w
        |  ON o_orderdate >= w.l_shipdate
        |    AND o_orderdate < w.l_shipdate + INTERVAL 7 DAY
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      // Shipdates are day-granular, so the ~12% of lineitem rows passing the
      // quantity filter collapse to ~2.5k DISTINCT windows: pre-aggregate
      // duplicates to (window, multiplicity) BEFORE banding and sum the
      // multiplicities after — identical result, and the banded join's
      // intermediate shrinks by the duplication factor (~30x here). This is
      // the aggregation-through-join pushdown a cost-based optimizer would
      // want; done by hand because the multiplicity ride-along changes the
      // join's output schema.
      val windows = Tables.lineitem(s, d).filter(col("l_quantity") >= 45)
        .select(col("l_shipdate").as("w_start"),
          (col("l_shipdate") + expr("INTERVAL 7 DAYS")).as("w_end"))
        .groupBy(col("w_start"), col("w_end"))
        .agg(count(lit(1)).as("w_mult"))
      graft.operators.RangeJoin.bandedRangeJoin(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        windows, "o_orderdate", "w_start", "w_end",
        bandMicros = 7L * 24 * 3600 * 1000000)
        .groupBy(col("o_orderkey"))
        .agg(sum(col("w_mult")).as("n_windows"))
        .orderBy(col("o_orderkey"))
    },

    // J-extension: full outer join — unmatched rows from BOTH sides survive
    // with nulls (customers with no orders + orders of unknown customers).
    QueryDef(
      "j6_full_outer_join",
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer FULL OUTER JOIN orders ON c_custkey = o_custkey
        |ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.customer(s, d).join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"), "full_outer")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("c_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first)
    },

    // A-extension: exact median/quantiles (Spark `percentile` is exact with
    // linear interpolation, like DuckDB quantile_cont). Rounded to 6dp to
    // absorb the one-ulp formula difference between engines' interpolation.
    QueryDef(
      "a8_median",
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
        |  round(quantile_cont(o_totalprice, 0.9), 6) AS p90_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(round(expr("percentile(o_totalprice, 0.5)"), 6).as("median_price"),
          round(expr("percentile(o_totalprice, 0.9)"), 6).as("p90_price"))
        .orderBy(col("o_orderpriority"))
    },

    // ---- §2b projections / filters ---------------------------------------

    // P1: column rename (period -> date; EIA930…:100).
    QueryDef(
      "p1_rename",
      """SELECT l_orderkey, l_linenumber, l_shipdate AS date FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      EtlOps.renameColumn("l_shipdate", "date")(Tables.lineitem(s, d))
        .select(col("l_orderkey"), col("l_linenumber"), col("date"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // P2: lossy timestamp parse — unparseable strings coerce to NULL
    // (errors='coerce', EIA930…:101). Garbage injected on event_id % 7.
    QueryDef(
      "p2_ts_coerce",
      """SELECT event_id,
        |  TRY_CAST(CASE WHEN event_id % 7 = 0 THEN 'not-a-timestamp'
        |                ELSE strftime(ts, '%Y-%m-%d %H:00:00') END AS TIMESTAMP) AS parsed_ts
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .withColumn("raw",
          when(col("event_id") % 7 === 0, lit("not-a-timestamp"))
            .otherwise(date_format(col("ts"), "yyyy-MM-dd HH:00:00")))
        .transform(EtlOps.lossyTimestamp("raw", "parsed_ts"))
        .select(col("event_id"), col("parsed_ts"))
        .orderBy(col("event_id"))
    },

    // P3: month-end snap (MonthEnd(0), EIA814…:66).
    QueryDef(
      "p3_month_end",
      """SELECT o_orderkey, last_day(o_orderdate) AS month_end FROM orders
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      EtlOps.monthEnd("o_orderdate", "month_end")(Tables.orders(s, d))
        .select(col("o_orderkey"), col("month_end"))
        .orderBy(col("o_orderkey"))
    },

    // P4: half-open time cutoff (the relational form of the positional
    // iloc slice, EIA930…:102).
    QueryDef(
      "p4_time_cutoff",
      """SELECT event_id, ts FROM events
        |WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      EtlOps.cutoffBefore("ts", java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))(
        Tables.events(s, d))
        .select(col("event_id"), col("ts"))
        .orderBy(col("event_id"))
    },

    // P7 (+P6/P15/F8/F9): JSON field -> numeric coerce -> drop unparseable
    // (EIA7A…:80-82 with the JSON access of EIA930…:100).
    QueryDef(
      "p7_numeric_coerce_filter",
      """SELECT event_id, k_num FROM (
        |  SELECT event_id,
        |    TRY_CAST(CASE WHEN event_id % 7 = 0 THEN 'NaNope'
        |                  ELSE json_extract_string(props, '$.k') END AS DOUBLE) AS k_num
        |  FROM events
        |) WHERE k_num IS NOT NULL ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .withColumn("k_str",
          when(col("event_id") % 7 === 0, lit("NaNope"))
            .otherwise(get_json_object(col("props"), "$.k")))
        .transform(EtlOps.numericParsable("k_str", "k_num"))
        .select(col("event_id"), col("k_num"))
        .orderBy(col("event_id"))
    },

    // P8: null-rejecting inequality ('!= "Total"', EIA7A…:86).
    QueryDef(
      "p8_not_equal",
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE o_orderpriority <> '1-URGENT' ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      EtlOps.notEqual("o_orderpriority", "1-URGENT")(Tables.orders(s, d))
        .select(col("o_orderkey"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    },

    // P9: NULL fill with sentinel (EIA7A…:88); NULLs synthesized via NULLIF
    // since the fixtures are dense.
    QueryDef(
      "p9_fill_null",
      """SELECT COALESCE(NULLIF(l_returnflag, 'N'), 'Not Specified') AS flag,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY flag""".stripMargin) { (s, d) =>
      EtlOps.fillNulls(Map("flag" -> "Not Specified"))(
        Tables.lineitem(s, d)
          .withColumn("flag", nullif(col("l_returnflag"), lit("N"))))
        .groupBy(col("flag")).agg(count(lit(1)).as("n"))
        .orderBy(col("flag"))
    },

    // P6: drop rows with NULLs in key columns (EIA7A…:80); NULLs synthesized
    // via NULLIF since the fixtures are dense. Two keys so the subset
    // semantics (ALL listed keys non-null) are exercised.
    QueryDef(
      "p6_drop_null_keys",
      """SELECT l_orderkey, l_linenumber, m, f FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    NULLIF(l_linestatus, 'O') AS m, NULLIF(l_returnflag, 'N') AS f
        |  FROM lineitem)
        |WHERE m IS NOT NULL AND f IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      EtlOps.dropNullKeys("m", "f")(
        Tables.lineitem(s, d).select(
          col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_linestatus"), lit("O")).as("m"),
          nullif(col("l_returnflag"), lit("N")).as("f")))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // P10/F4: quarter-label equality (EIA7A…:76,90).
    QueryDef(
      "p10_quarter_filter",
      """SELECT o_orderkey, o_orderdate FROM orders
        |WHERE (CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR) || '-Q' ||
        |       CAST(EXTRACT(quarter FROM o_orderdate) AS VARCHAR)) = '1996-Q2'
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      EtlOps.quarterEquals("o_orderdate", "1996-Q2")(Tables.orders(s, d))
        .select(col("o_orderkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey"))
    },

    // P14/F1: snake-case column renaming (EIA930…:145-155) — applied to a
    // camelCase projection; the oracle just names the same columns.
    QueryDef(
      "p14_snake_case",
      """SELECT o_orderkey AS order_key, o_totalprice AS total_price,
        |  o_orderpriority AS order_priority
        |FROM orders ORDER BY order_key""".stripMargin) { (s, d) =>
      graft.core.Naming.snakeCaseColumns(
        Tables.orders(s, d)
          .select(col("o_orderkey").as("orderKey"),
                  col("o_totalprice").as("Total Price"),
                  col("o_orderpriority").as("order-priority")))
        .orderBy(col("order_key"))
    },

    // P11/P12/P13: positional projection, ignore-missing drop, reorder
    // (OpenMeteo…:98,104-105) — composed on lineitem.
    QueryDef(
      "p11_13_project_drop_reorder",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val projected = EtlOps.selectColumns(li.columns.take(6).toSeq)(li)
      val dropped = EtlOps.dropColumns("l_partkey", "l_suppkey", "no_such_column")(projected)
      EtlOps.selectColumns(Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"))(dropped)
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // S5/P16: positional column slice — first 6 columns (EIA930…:34).
    QueryDef(
      "s5_column_slice",
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
        |  l_extendedprice
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      EtlOps.selectColumns(li.columns.take(6).toSeq)(li)
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- §2f scalar functions --------------------------------------------

    // F3: relative month arithmetic + YYYY-MM format (EIA814…:19).
    QueryDef(
      "f3_add_months",
      """SELECT strftime(o_orderdate - INTERVAL 3 MONTH, '%Y-%m') AS ym,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY ym""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .withColumn("ym", date_format(add_months(col("o_orderdate"), -3), "yyyy-MM"))
        .groupBy(col("ym")).agg(count(lit(1)).as("n"))
        .orderBy(col("ym"))
    },

    // F5: hourly timestamp range generation, inclusive bounds
    // (OpenMeteo…:67-70; the reference's end-exclusive range is modeled by
    // an explicit last step at +23h).
    QueryDef(
      "f5_hourly_sequence",
      """SELECT o_orderkey, unnest(generate_series(o_orderdate,
        |  o_orderdate + INTERVAL 23 HOUR, INTERVAL 1 HOUR)) AS hour_ts
        |FROM orders WHERE o_orderkey % 100 = 0
        |ORDER BY o_orderkey, hour_ts""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") % 100 === 0)
        .select(col("o_orderkey"),
          explode(sequence(col("o_orderdate"),
            col("o_orderdate") + expr("INTERVAL 23 HOURS"),
            expr("INTERVAL 1 HOUR"))).as("hour_ts"))
        .orderBy(col("o_orderkey"), col("hour_ts"))
    },

    // F6: epoch seconds -> UTC timestamp (OpenMeteo…:67-68). The oracle uses
    // timezone-free interval arithmetic so the check is independent of the
    // oracle process's session TZ.
    QueryDef(
      "f6_epoch_seconds",
      """SELECT event_id,
        |  TIMESTAMP '1970-01-01 00:00:00' +
        |    (1700000000 + event_id * 3600) * INTERVAL 1 SECOND AS epoch_ts
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          timestamp_seconds(lit(1700000000L) + col("event_id") * 3600).as("epoch_ts"))
        .orderBy(col("event_id"))
    },

    // F7: hour-granularity transport format yyyy-MM-ddTHH
    // (EIA930…:102, OpenMeteo…:70,81).
    QueryDef(
      "f7_hour_format",
      """SELECT strftime(ts, '%Y-%m-%dT%H') AS hour_str, COUNT(*) AS n
        |FROM events GROUP BY 1 ORDER BY hour_str""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .withColumn("hour_str", date_format(col("ts"), "yyyy-MM-dd'T'HH"))
        .groupBy(col("hour_str")).agg(count(lit(1)).as("n"))
        .orderBy(col("hour_str"))
    },

    // ---- §2e sorts / limits / unions -------------------------------------

    // O1/O2/O3: multi-key total-order sort with explicit tiebreak.
    QueryDef(
      "o1_multi_sort",
      """SELECT user_id, ts, event_id FROM events
        |ORDER BY user_id, ts, event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },

    // O5: deterministic top-k (TakeOrderedAndProject — no global sort).
    QueryDef(
      "o5_top_k",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
      EtlOps.topK(100, Seq(col("o_totalprice").desc, col("o_orderkey").asc))(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice")))
    },

    // U1: union-all of "pages" then aggregate (pd.concat of page frames,
    // EIA930…:100) — pages carved by key mod.
    QueryDef(
      "u1_union_pages",
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS sum_qty
        |FROM (
        |  SELECT * FROM lineitem WHERE l_orderkey % 3 = 0
        |  UNION ALL SELECT * FROM lineitem WHERE l_orderkey % 3 = 1
        |  UNION ALL SELECT * FROM lineitem WHERE l_orderkey % 3 = 2
        |) GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val pages = Seq(0, 1, 2).map(i => li.filter(col("l_orderkey") % 3 === i))
      EtlOps.unionPages(pages)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), ExactAgg.sumExact(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    },

    // Latest-wins merge upsert over orders: updates rewrite status/price at
    // a later version, inserts add new keys, everything else passes through
    // untouched — the relational MERGE in one union + window pass.
    QueryDef(
      "u3_merge_upsert",
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate FROM orders),
        |updates AS (
        |  SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 2 AS o_totalprice,
        |    o_orderdate + INTERVAL 1 DAY AS o_orderdate
        |  FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, 'N', o_totalprice,
        |    o_orderdate + INTERVAL 1 DAY
        |  FROM orders WHERE o_orderkey % 10 = 1),
        |tagged AS (
        |  SELECT *, 0 AS src FROM base
        |  UNION ALL SELECT *, 1 AS src FROM updates)
        |SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
        |    ORDER BY o_orderdate DESC, src DESC) AS rn
        |  FROM tagged) WHERE rn = 1
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val base = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate"))
      val updates = Tables.orders(s, d).filter(col("o_orderkey") % 10 === 0)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice"),
          (col("o_orderdate") + expr("INTERVAL 1 DAY")).as("o_orderdate"))
        .unionByName(Tables.orders(s, d).filter(col("o_orderkey") % 10 === 1)
          .select((col("o_orderkey") + 10000000).as("o_orderkey"),
            lit("N").as("o_orderstatus"), col("o_totalprice"),
            (col("o_orderdate") + expr("INTERVAL 1 DAY")).as("o_orderdate")))
      EtlOps.mergeUpsert(base, updates, Seq("o_orderkey"), "o_orderdate")
        .orderBy(col("o_orderkey"))
    },

    // U-extension: CDC APPLY (EtlOps.cdcApply) — u3's merge with
    // TOMBSTONES: a Debezium-style changelog of I/U/D after-images folds
    // into the snapshot in one union + one key-window pass. The log
    // exercises every path: update (seq 1), delete (seq 1),
    // delete-then-REINSERT (the %20=1 keys come back at seq 2 with new
    // values), update-then-DELETE (the %20=0 keys vanish despite their
    // seq-1 update). Latest seq wins, change side beats base on ties.
    QueryDef(
      "u6_cdc_apply",
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate FROM orders),
        |chg AS (
        |  SELECT o_orderkey, 'U' AS op, CAST(1 AS BIGINT) AS seq,
        |      'U' AS o_orderstatus, o_totalprice * 2 AS o_totalprice,
        |      o_orderdate + INTERVAL 1 DAY AS o_orderdate
        |    FROM base WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 'D', CAST(1 AS BIGINT), o_orderstatus,
        |      o_totalprice, o_orderdate
        |    FROM base WHERE o_orderkey % 10 = 1
        |  UNION ALL
        |  SELECT o_orderkey, 'I', CAST(2 AS BIGINT), 'R',
        |      o_totalprice + 1000, o_orderdate + INTERVAL 2 DAY
        |    FROM base WHERE o_orderkey % 20 = 1
        |  UNION ALL
        |  SELECT o_orderkey, 'D', CAST(2 AS BIGINT), o_orderstatus,
        |      o_totalprice, o_orderdate
        |    FROM base WHERE o_orderkey % 20 = 0),
        |tagged AS (
        |  SELECT o_orderkey, 'I' AS op, CAST(0 AS BIGINT) AS seq, 0 AS src,
        |    o_orderstatus, o_totalprice, o_orderdate FROM base
        |  UNION ALL
        |  SELECT o_orderkey, op, seq, 1, o_orderstatus, o_totalprice,
        |    o_orderdate FROM chg)
        |SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
        |    ORDER BY seq DESC, src DESC) AS rn FROM tagged)
        |WHERE rn = 1 AND op <> 'D'
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val base = Tables.orders(s, d).select(col("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"))
      def ch(cond: Column, op: String, seq: Long, st: Column, pr: Column,
             dt: Column) =
        base.filter(cond).select(col("o_orderkey"), st.as("o_orderstatus"),
          pr.as("o_totalprice"), dt.as("o_orderdate"),
          lit(seq).as("seq"), lit(op).as("op"))
      val changes =
        ch(col("o_orderkey") % 10 === 0, "U", 1L, lit("U"),
          col("o_totalprice") * 2, col("o_orderdate") + expr("INTERVAL 1 DAY"))
        .unionByName(ch(col("o_orderkey") % 10 === 1, "D", 1L,
          col("o_orderstatus"), col("o_totalprice"), col("o_orderdate")))
        .unionByName(ch(col("o_orderkey") % 20 === 1, "I", 2L, lit("R"),
          col("o_totalprice") + 1000,
          col("o_orderdate") + expr("INTERVAL 2 DAY")))
        .unionByName(ch(col("o_orderkey") % 20 === 0, "D", 2L,
          col("o_orderstatus"), col("o_totalprice"), col("o_orderdate")))
      EtlOps.cdcApply(base, changes, Seq("o_orderkey"), "seq", "op")
        .orderBy(col("o_orderkey"))
    },

    // U4: SCD Type-2 history build (EtlOps.scd2) — each customer's order
    // stream collapsed to validity ranges of their order priority. The
    // oracle mirrors both windows (change detection by lag, range close by
    // lead over survivors); (o_orderdate, o_orderkey) is a total order per
    // customer so survivorship is deterministic.
    QueryDef(
      "u4_scd2_history",
      """WITH ordered AS (
        |  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
        |    lag(o_orderpriority) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |changes AS (
        |  SELECT * FROM ordered WHERE prev IS NULL OR prev <> o_orderpriority)
        |SELECT o_custkey, o_orderpriority, o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS valid_to,
        |  lead(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
        |FROM changes
        |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin) { (s, d) =>
      EtlOps.scd2(Tables.orders(s, d), "o_custkey",
          Seq("o_orderdate", "o_orderkey"), Seq("o_orderpriority"))
        .orderBy(col("o_custkey"), col("valid_from"))
    },

    // U5: snapshot diff / CDC extract (EtlOps.snapshotDiff) — the change
    // feed between two full dumps: one key-hashed full-outer join,
    // null-safe attribute compare in the projection, unchanged keys
    // dropped. The new state deterministically deletes keys %10=2,
    // doubles totalprice for %10=0, and inserts shifted copies of %10=1.
    QueryDef(
      "u5_snapshot_diff",
      """WITH oldt AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |newt AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderkey % 10 <> 2
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, 'N', o_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 1)
        |SELECT op, o_orderkey, o_orderstatus, o_totalprice FROM (
        |  SELECT CASE WHEN o.o_orderkey IS NULL THEN 'I'
        |              WHEN n.o_orderkey IS NULL THEN 'D'
        |              WHEN o.o_orderstatus <> n.o_orderstatus
        |                OR o.o_totalprice <> n.o_totalprice THEN 'U' END AS op,
        |    coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
        |    CASE WHEN n.o_orderkey IS NULL THEN o.o_orderstatus
        |         ELSE n.o_orderstatus END AS o_orderstatus,
        |    CASE WHEN n.o_orderkey IS NULL THEN o.o_totalprice
        |         ELSE n.o_totalprice END AS o_totalprice
        |  FROM oldt o FULL OUTER JOIN newt n ON o.o_orderkey = n.o_orderkey)
        |WHERE op IS NOT NULL ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val oldT = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val newT = Tables.orders(s, d).filter(col("o_orderkey") % 10 =!= 2)
        .select(col("o_orderkey"), col("o_orderstatus"),
          when(col("o_orderkey") % 10 === 0, col("o_totalprice") * 2)
            .otherwise(col("o_totalprice")).as("o_totalprice"))
        .unionByName(Tables.orders(s, d).filter(col("o_orderkey") % 10 === 1)
          .select((col("o_orderkey") + 10000000).as("o_orderkey"),
            lit("N").as("o_orderstatus"), col("o_totalprice")))
      EtlOps.snapshotDiff(oldT, newT, Seq("o_orderkey"),
          Seq("o_orderstatus", "o_totalprice"))
        .orderBy(col("o_orderkey"))
    },

    // ---- window functions (engine surface beyond the reference) ----------

    // W2: ranked top-n per group with deterministic tiebreak.
    QueryDef(
      "w2_rownum_topn",
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders
        |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    },

    // W3: lag delta per key (sessionized change detection).
    QueryDef(
      "w3_lag_delta",
      """SELECT event_id, user_id, value,
        |  value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |    AS delta
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .withColumn("delta", col("value") - lag(col("value"), 1).over(w))
        .select(col("event_id"), col("user_id"), col("value"), col("delta"))
        .orderBy(col("event_id"))
    },

    // W4: batch gap-based sessionization — the relational twin of the
    // streaming flatMapGroupsWithState path (EventStreams.sessionize): a
    // session break is a >30-min gap; session id = running count of breaks.
    // Gap compares epoch MICROS (exact integers) so both engines agree.
    QueryDef(
      "w4_sessionize",
      """WITH marks AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
        |        OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
        |      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marks)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin) { (s, d) =>
      graft.operators.EventOps.sessionize(Tables.events(s, d), "user_id",
          "ts", "event_id", gapMinutes = 30)
        .orderBy(col("user_id"), col("session_id"))
    },

    // W4b: the BUILT-IN session_window formulation of w4's gap
    // sessionization — same 30-minute-gap semantics through Spark's native
    // session-window aggregation (the streaming-capable operator), checked
    // against the same window-function oracle (session end = last event +
    // gap by session_window's definition).
    QueryDef(
      "w7_session_window",
      """WITH marks AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
        |        OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
        |      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM marks)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  COUNT(*) AS n_events
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    },

    // W5: rolling time-range aggregate — per event, activity of the same
    // user in the trailing hour (RANGE frame over epoch micros; the decimal
    // cast keeps the windowed double sum engine-exact).
    QueryDef(
      "w5_rolling_range",
      """SELECT event_id, user_id, n_1h, CAST(dsum AS DOUBLE) AS sum_1h FROM (
        |  SELECT event_id, user_id,
        |    COUNT(*) OVER w AS n_1h,
        |    SUM(CAST(value AS DECIMAL(25,4))) OVER w AS dsum
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW))
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600000000L, 0L)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_1h"),
          sum(col("value").cast("decimal(25,4)")).over(w).cast("double").as("sum_1h"))
        .orderBy(col("event_id"))
    },

    // W6: ntile + percent_rank — the quantile-bucketing windows a
    // quality-score percentile filter uses.
    QueryDef(
      "w6_ntile",
      """SELECT event_id, event_type,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pr
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pr"))
        .orderBy(col("event_id"))
    },

    // A10: exact correlation per group — NOT Spark's streaming corr() (a
    // float fold whose result depends on partitioning): the five decimal
    // moment sums are exact under any accumulation order, and the Pearson
    // formula is one fixed double expression both engines evaluate
    // identically.
    QueryDef(
      "a10_corr_exact",
      """SELECT event_type,
        |  (n * sxy - sx * sy) /
        |    nullif(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy), 0.0) AS corr_uv
        |FROM (
        |  SELECT event_type,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(25,4))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(user_id AS DECIMAL(25,4))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(value * user_id AS DECIMAL(25,4))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(value * value AS DECIMAL(25,4))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(user_id * user_id AS DECIMAL(25,4))) AS DOUBLE) AS syy
        |  FROM events GROUP BY event_type)
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          ExactAgg.sumExact(col("value")).as("sx"),
          ExactAgg.sumExact(col("user_id")).as("sy"),
          ExactAgg.sumExact(col("value") * col("user_id")).as("sxy"),
          ExactAgg.sumExact(col("value") * col("value")).as("sxx"),
          ExactAgg.sumExact(col("user_id") * col("user_id")).as("syy"))
        .select(col("event_type"),
          ((col("n") * col("sxy") - col("sx") * col("sy")) /
            nullif(sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy")), lit(0.0)))
            .as("corr_uv"))
        .orderBy(col("event_type"))
    },

    // A-extension: EXACT skewness / excess kurtosis per key from decimal
    // power sums (the a10 exact-moments discipline extended to 3rd/4th
    // order): every sum is order-independent decimal arithmetic, the
    // central-moment algebra is one identical IEEE expression tree on both
    // engines, so the shape statistics hash-match without any rounding.
    QueryDef(
      "a13_moments_exact",
      """SELECT event_type, CAST(n AS BIGINT) AS n,
        |  (s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
        |    / nullif((s2 / n - (s1 / n) * (s1 / n))
        |        * sqrt(s2 / n - (s1 / n) * (s1 / n)), 0.0) AS skewness,
        |  (s4 / n - 4 * (s1 / n) * (s3 / n)
        |     + 6 * (s1 / n) * (s1 / n) * (s2 / n)
        |     - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
        |    / nullif((s2 / n - (s1 / n) * (s1 / n)) * (s2 / n - (s1 / n) * (s1 / n)), 0.0)
        |    - 3 AS kurtosis_excess
        |FROM (
        |  SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(25,4))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(value * value AS DECIMAL(25,4))) AS DOUBLE) AS s2,
        |    CAST(SUM(CAST(value * value * value AS DECIMAL(25,4))) AS DOUBLE) AS s3,
        |    CAST(SUM(CAST(value * value * value * value AS DECIMAL(25,4))) AS DOUBLE) AS s4
        |  FROM events GROUP BY event_type)
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      val m = col("s1") / col("n")
      val m2c = col("s2") / col("n") - m * m
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          ExactAgg.sumExact(col("value")).as("s1"),
          ExactAgg.sumExact(col("value") * col("value")).as("s2"),
          ExactAgg.sumExact(col("value") * col("value") * col("value")).as("s3"),
          ExactAgg.sumExact(col("value") * col("value") * col("value") * col("value")).as("s4"))
        .select(col("event_type"), col("n").cast("long").as("n"),
          ((col("s3") / col("n") - lit(3) * m * (col("s2") / col("n"))
            + lit(2) * m * m * m)
            / nullif(m2c * sqrt(m2c), lit(0.0))).as("skewness"),
          ((col("s4") / col("n") - lit(4) * m * (col("s3") / col("n"))
            + lit(6) * m * m * (col("s2") / col("n"))
            - lit(3) * m * m * m * m)
            / nullif(m2c * m2c, lit(0.0)) - lit(3)).as("kurtosis_excess"))
        .orderBy(col("event_type"))
    },

    // A-extension: EXACT per-group order statistics WITHOUT a per-group
    // sort or value buffer (ApproxOps.exactGroupRank — the two-level
    // prefix discipline applied to an aggregate): value-range buckets,
    // (group, bucket) counts, driver scan to the target bucket, exact
    // resolve from that bucket's value-level counts. Lower median / lower
    // p90 are ELEMENTS of the data (no interpolation), so the contract is
    // integer-exact where a8's percentile() buffers whole groups in
    // executor memory. Oracle derives the same ranks with a window.
    QueryDef(
      "a14_group_rank_exact",
      """WITH r AS (SELECT source, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
        |    COUNT(*) OVER (PARTITION BY source) AS n FROM documents),
        |med AS (SELECT source, n_chars AS median_chars FROM r
        |  WHERE rn = (n + 1) // 2),
        |p90 AS (SELECT source, n_chars AS p90_chars FROM r
        |  WHERE rn = (9 * n + 9) // 10),
        |cnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents GROUP BY source)
        |SELECT source, n, median_chars, p90_chars
        |FROM cnt JOIN med USING (source) JOIN p90 USING (source)
        |ORDER BY source""".stripMargin) { (s, d) =>
      import graft.operators.ApproxOps
      val docs = Tables.documents(s, d)
      val med = ApproxOps.exactGroupRank(docs, "source", "n_chars", 1, 2)
        .select(col("grp").as("source"), col("n"),
          col("val").as("median_chars"))
      val p90 = ApproxOps.exactGroupRank(docs, "source", "n_chars", 9, 10)
        .select(col("grp").as("source"), col("val").as("p90_chars"))
      med.join(p90, Seq("source")).orderBy(col("source"))
    },

    // A-extension: token-WEIGHTED exact median doc length per source
    // (ApproxOps.exactGroupWeightedRank — a14's two-level machinery with a
    // per-row weight): the doc length at cumulative-token rank ceil(W/2),
    // i.e. "the median TOKEN lives in a doc this long" — the corpus
    // statistic an unweighted median misstates by the length skew. Oracle
    // derives the same cumulative-weight rank with a window.
    QueryDef(
      "a15_weighted_median",
      """WITH q AS (SELECT source, CAST(n_chars AS BIGINT) AS v,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS wt
        |  FROM documents),
        |g AS (SELECT source, v, SUM(wt) AS m FROM q GROUP BY 1, 2),
        |t AS (SELECT source, CAST(SUM(m) AS BIGINT) AS n FROM g GROUP BY 1),
        |p AS (SELECT source, v, SUM(m) OVER (PARTITION BY source ORDER BY v
        |    ROWS UNBOUNDED PRECEDING) AS cw FROM g)
        |SELECT p.source AS grp, t.n, CAST((t.n + 1) // 2 AS BIGINT) AS rank,
        |  CAST(MIN(CASE WHEN cw >= (t.n + 1) // 2 THEN v END) AS BIGINT) AS val
        |FROM p JOIN t ON p.source = t.source
        |GROUP BY p.source, t.n ORDER BY grp""".stripMargin) { (s, d) =>
      import graft.operators.ApproxOps
      val docs = Tables.documents(s, d).select(col("source"),
        col("n_chars"), size(split(col("text"), " ")).cast("long").as("wt"))
      ApproxOps.exactGroupWeightedRank(docs, "source", "n_chars", "wt", 1, 2)
        .orderBy(col("grp"))
    },

    // A-extension: MULTIPLE exact quantiles from ONE two-level walk
    // (ApproxOps.exactGroupQuantiles): p25/p50/p75/p99 of doc length per
    // language share the same (group, bucket) counts and one value resolve
    // over the union of target buckets — four quantiles, one pass, where
    // a14's operator costs one walk EACH. Oracle derives each rank with a
    // window over a VALUES quantile table.
    QueryDef(
      "a16_group_quantiles_exact",
      """WITH r AS (SELECT lang AS grp, CAST(n_chars AS BIGINT) AS k,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
        |    COUNT(*) OVER (PARTITION BY lang) AS n FROM documents),
        |q(q_num, q_den) AS (VALUES (1, 4), (1, 2), (3, 4), (99, 100))
        |SELECT grp, CAST(q_num AS BIGINT) AS q_num,
        |  CAST(q_den AS BIGINT) AS q_den, CAST(n AS BIGINT) AS n,
        |  CAST((q_num * n + q_den - 1) // q_den AS BIGINT) AS rank,
        |  k AS val
        |FROM r CROSS JOIN q
        |WHERE rn = (q_num * n + q_den - 1) // q_den
        |ORDER BY grp, q_den, q_num""".stripMargin) { (s, d) =>
      import graft.operators.ApproxOps
      ApproxOps.exactGroupQuantiles(Tables.documents(s, d), "lang",
          "n_chars", Seq((1L, 4L), (1L, 2L), (3L, 4L), (99L, 100L)))
        .orderBy(col("grp"), col("q_den"), col("q_num"))
    },

    // W-extension: time-DECAYED aggregate per key — recency-weighted
    // engagement scoring with a one-day half-life, weight = 2^-(age_days)
    // anchored at the data's max ts. The decay base is 2 BY DESIGN: the
    // weight is an exact integer shift (value_fp << (30 - age)), summed in
    // decimal — no libm exp() on either engine (the LnFp rationale applied
    // to decay), so the scores hash-match bit-for-bit. Ages cap at 30 days
    // (weight 1 floor); one scan + one broadcast max.
    QueryDef(
      "w10_decayed_sum",
      """WITH mx AS (SELECT max(ts) AS mts FROM events),
        |e AS (SELECT event_type,
        |    CAST(round(value * 1000) AS BIGINT) AS vfp,
        |    least((epoch_us(mts) - epoch_us(ts)) // 86400000000, 30) AS age
        |  FROM events CROSS JOIN mx)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  round(CAST(SUM(CAST(vfp AS DECIMAL(18,0))
        |        * CAST(CAST(1 AS BIGINT) << (30 - age) AS DECIMAL(11,0)))
        |      AS DOUBLE) / 1073741824.0 / 1000.0, 6) AS decayed_sum,
        |  round(CAST(SUM(CAST(CAST(1 AS BIGINT) << (30 - age) AS DECIMAL(11,0)))
        |      AS DOUBLE) / 1073741824.0, 6) AS decayed_count
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val mx = ev.agg(max(col("ts")).as("mts"))
      val e = ev.crossJoin(broadcast(mx))
        .select(col("event_type"),
          round(col("value") * 1000).cast("long").as("vfp"),
          least(expr("(unix_micros(mts) - unix_micros(ts)) div 86400000000"),
            lit(30L)).as("age"))
        .withColumn("w", expr("shiftleft(1L, cast(30 - age AS int))"))
      // multiply IN DECIMAL: vfp * w in LongType would wrap silently for
      // |value| > ~8.6e6 at age 0 (w = 2^30) under non-ANSI Spark while
      // DuckDB errors — the cast must happen before the product
      e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("vfp").cast("decimal(18,0)") * col("w").cast("decimal(11,0)")).as("ds"),
          sum(col("w").cast("decimal(11,0)")).as("dc"))
        .select(col("event_type"), col("n"),
          round(col("ds").cast("double") / 1073741824.0 / 1000.0, 6).as("decayed_sum"),
          round(col("dc").cast("double") / 1073741824.0, 6).as("decayed_count"))
        .orderBy(col("event_type"))
    },

    // W-extension: ordered-sequence FUNNEL (Funnel.steps) — users reaching
    // view -> click -> purchase where step k counts only STRICTLY AFTER the
    // user's step k-1 first-occurrence (a purchase logged before the first
    // view converts nothing). One hash partitioning on user_id carries all
    // three chained window passes AND the per-user rollup; the summary is a
    // single-row aggregate exploded to 3 rows. Conversion rates are IEEE
    // divisions of exact longs; step 1 has no previous step (NULL).
    QueryDef(
      "w11_funnel_steps",
      """WITH u1 AS (SELECT user_id, ts, event_type,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS t0
        |  FROM events),
        |u2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t0
        |      THEN ts END) OVER (PARTITION BY user_id) AS t1 FROM u1),
        |u3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t1
        |      THEN ts END) OVER (PARTITION BY user_id) AS t2 FROM u2),
        |per AS (SELECT user_id, MIN(t0) AS t0, MIN(t1) AS t1, MIN(t2) AS t2
        |  FROM u3 GROUP BY user_id),
        |n AS (SELECT CAST(COUNT(t0) AS BIGINT) AS n0,
        |    CAST(COUNT(t1) AS BIGINT) AS n1,
        |    CAST(COUNT(t2) AS BIGINT) AS n2 FROM per)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
        |    n0 AS n_users,
        |    CASE WHEN n0 > 0 THEN CAST(n0 AS DOUBLE) / CAST(n0 AS DOUBLE) END
        |      AS pct_of_first,
        |    CAST(NULL AS DOUBLE) AS pct_of_prev FROM n
        |  UNION ALL
        |  SELECT CAST(2 AS BIGINT), 'click', n1,
        |    CASE WHEN n0 > 0 THEN CAST(n1 AS DOUBLE) / CAST(n0 AS DOUBLE) END,
        |    CASE WHEN n0 > 0 THEN CAST(n1 AS DOUBLE) / CAST(n0 AS DOUBLE) END
        |  FROM n
        |  UNION ALL
        |  SELECT CAST(3 AS BIGINT), 'purchase', n2,
        |    CASE WHEN n0 > 0 THEN CAST(n2 AS DOUBLE) / CAST(n0 AS DOUBLE) END,
        |    CASE WHEN n1 > 0 THEN CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE) END
        |  FROM n)
        |ORDER BY step""".stripMargin) { (s, d) =>
      graft.operators.Funnel.steps(Tables.events(s, d), "user_id", "ts",
          "event_type", Seq("view", "click", "purchase"))
        .orderBy(col("step"))
    },

    // W-extension: longest activity STREAK per user (gaps-and-islands):
    // distinct activity dates, island anchor = date − row_number days (a
    // run of consecutive dates shares one anchor), per-island length and
    // bounds, then each user's best streak by (length desc, start asc).
    // Per-user windows are day-bounded; the argmax is the w2
    // WindowGroupLimit shape. The retention metric every engagement
    // dashboard ships.
    QueryDef(
      "w12_activity_streaks",
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |isl AS (SELECT user_id, d,
        |    d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
        |      AS INTEGER) AS anchor
        |  FROM days),
        |st AS (SELECT user_id, anchor, CAST(COUNT(*) AS BIGINT) AS streak_days,
        |    MIN(d) AS streak_start, MAX(d) AS streak_end
        |  FROM isl GROUP BY user_id, anchor),
        |best AS (SELECT user_id, streak_days, streak_start, streak_end,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY streak_days DESC, streak_start) AS rn
        |  FROM st)
        |SELECT user_id, streak_days, streak_start, streak_end
        |FROM best WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, d) =>
      graft.operators.EventOps.bestStreaks(Tables.events(s, d), "user_id", "ts")
        .orderBy(col("user_id"))
    },

    // A-extension: exact MODE per group (most frequent integerized value,
    // deterministic smallest-value tie-break): one (group, value) count
    // aggregate + the WindowGroupLimit argmax — never a global value sort.
    QueryDef(
      "a17_group_mode",
      """WITH c AS (SELECT event_type, CAST(floor(value) AS BIGINT) AS vb,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, vb, n,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY n DESC, vb) AS rn
        |  FROM c)
        |SELECT event_type, vb AS mode_value, n AS n_occurrences
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin) { (s, d) =>
      val best = Window.partitionBy(col("event_type"))
        .orderBy(col("n").desc, col("vb"))
      Tables.events(s, d)
        .groupBy(col("event_type"), floor(col("value")).cast("long").as("vb"))
        .agg(count(lit(1)).as("n"))
        .withColumn("__rn", row_number().over(best))
        .filter(col("__rn") === 1)
        .select(col("event_type"), col("vb").as("mode_value"),
          col("n").as("n_occurrences"))
        .orderBy(col("event_type"))
    },

    // W-extension: TIME-WEIGHTED average per user (EventOps.twap — the
    // TWAP/sensor mean): each value holds until the user's next event, so
    // a reading that held 50 minutes outweighs one that held 10 seconds
    // (the plain mean's error on irregular series). Weighted sums are
    // DECIMAL(25,4)·micros products — exact until the one final division;
    // the last observation's holding period is unobserved and excluded.
    QueryDef(
      "w13_twap",
      """WITH o AS (SELECT user_id, value,
        |    epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
        |      - epoch_us(ts) AS dur
        |  FROM events)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(coalesce(SUM(dur), 0) AS BIGINT) AS observed_us,
        |  CASE WHEN coalesce(SUM(dur), 0) > 0 THEN
        |    round(CAST(SUM(CAST(value AS DECIMAL(24,4)) * CAST(dur AS DECIMAL(13,0)))
        |      AS DOUBLE) / CAST(SUM(dur) AS DOUBLE), 6)
        |  END AS twap
        |FROM o GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      graft.operators.EventOps.twap(Tables.events(s, d), "user_id", "ts",
          "event_id", "value")
        .orderBy(col("user_id"))
    },

    // W1: tumbling-window aggregate (batch twin of the streaming path;
    // window(ts, '1 hour').start == date_trunc('hour', ts)).
    QueryDef(
      "w1_tumbling_window",
      """SELECT date_trunc('hour', ts) AS hour_start, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(25,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY hour_start""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"), ExactAgg.sumExact(col("value")).as("sum_value"))
        .select(col("window.start").as("hour_start"), col("n"), col("sum_value"))
        .orderBy(col("hour_start"))
    },

    // W-extension: OVERLAPPING sliding windows (3 h long, sliding hourly) —
    // each row lands in 3 windows; Spark's window() generator expands them
    // map-side (no self-join), the oracle mirrors with an explicit 3-way
    // replication. Exact decimal sums, per the float discipline.
    QueryDef(
      "w8_sliding_window",
      """SELECT win_start, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(25,4))) AS DOUBLE) AS sum_value
        |FROM (SELECT date_trunc('hour', ts) - to_hours(i) AS win_start, value
        |      FROM events, unnest([0, 1, 2]) AS t(i))
        |GROUP BY win_start ORDER BY win_start""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "3 hours", "1 hour"))
        .agg(count(lit(1)).as("n"), ExactAgg.sumExact(col("value")).as("sum_value"))
        .select(col("window.start").as("win_start"), col("n"), col("sum_value"))
        .orderBy(col("win_start"))
    },

    // X-extension, TPC-H Q4 shape: EXISTS with a non-equi residual (a
    // lineitem shipped > 60 days after the order date) -> left-semi join
    // with a composite condition; Catalyst keeps the equi part as the hash
    // key and the inequality as the residual.
    QueryDef(
      "x6_late_ship_priority",
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM orders WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      o.join(l,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    },

    // X-extension, TPC-H Q16 shape: distinct-count of suppliers per part
    // attribute group with a dimension-side filter. The part dim broadcasts;
    // the distinct agg is the two-phase partial/final Catalyst plans for
    // free.
    QueryDef(
      "x7_supplier_part_counts",
      """SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_size IN (1, 5, 9) AND p_brand <> 'Brand#13'
        |GROUP BY p_brand, p_type
        |ORDER BY supplier_cnt DESC, p_brand, p_type""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .filter(col("p_size").isin(1, 5, 9) && col("p_brand") =!= "Brand#13")
          .select(col("p_partkey"), col("p_brand"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"))
    },

    // X-extension, TPC-H Q22 shape: global-average scalar subquery (exact
    // decimal avg — float discipline) + NOT EXISTS anti-join against a
    // filtered fact, grouped by a broadcast dim.
    QueryDef(
      "x8_rich_inactive_by_nation",
      """WITH ab AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,4))) AS DOUBLE)
        |    / COUNT(*) AS a FROM customer)
        |SELECT n_name, COUNT(*) AS n_rich_inactive
        |FROM customer JOIN nation ON c_nationkey = n_nationkey, ab
        |WHERE c_acctbal > a AND NOT EXISTS (
        |  SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
      val ab = Tables.customer(s, d)
        .agg((ExactAgg.sumExact(col("c_acctbal")) / count(lit(1))).as("a"))
      Tables.customer(s, d)
        .crossJoin(broadcast(ab))
        .filter(col("c_acctbal") > col("a"))
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 450000)
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_rich_inactive"))
        .orderBy(col("n_name"))
    },

    // X-extension, TPC-H Q2 shape: correlated min subquery ("the supplier
    // offering each part at its minimum unit price"). The DataFrame side
    // decorrelates to a per-part window min + equality filter: ONE lineitem
    // scan and ONE p_partkey exchange, where the textbook
    // aggregate-and-join-back form scans the fact twice and shuffles three
    // times; part and supplier dims broadcast. Unit price is a row-wise
    // IEEE division (no accumulation), so doubles compare bit-exactly across
    // engines.
    QueryDef(
      "x9_cheapest_supplier",
      """WITH pl AS (SELECT l_partkey, l_suppkey,
        |    l_extendedprice / l_quantity AS unit_price FROM lineitem)
        |SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name, unit_price
        |FROM pl JOIN part ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |WHERE p_size <= 5
        |  AND unit_price = (SELECT min(unit_price) FROM pl pl2
        |                    WHERE pl2.l_partkey = pl.l_partkey)
        |ORDER BY p_partkey, s_suppkey""".stripMargin) { (s, d) =>
      val smallParts = Tables.part(s, d).filter(col("p_size") <= 5)
        .select(col("p_partkey"), col("p_name"))
      val pl = Tables.lineitem(s, d)
        .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("p_name"), col("l_suppkey"),
          (col("l_extendedprice") / col("l_quantity")).as("unit_price"))
      val byPart = Window.partitionBy(col("p_partkey"))
      pl.withColumn("min_price", min(col("unit_price")).over(byPart))
        .filter(col("unit_price") === col("min_price"))
        .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
          col("unit_price"))
        .distinct()
        .orderBy(col("p_partkey"), col("s_suppkey"))
    },

    // X-extension, TPC-H Q21 shape: the double-correlated EXISTS / NOT
    // EXISTS self-join ("the supplier who alone shipped last on a
    // multi-supplier order"). Spark-first form: one left-semi + one
    // left-anti self-join on the same l_orderkey hash key — all three
    // lineitem scans share one Exchange partitioning, the inequality parts
    // ride as join residuals, and the order-status filter plus the supplier
    // dim broadcast. Counts are exact integers.
    QueryDef(
      "x10_waiting_orders",
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |  JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate >= l1.l_shipdate)
        |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin) { (s, d) =>
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val l1 = l.join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
      val other = l.select(col("l_orderkey").as("o_lok"), col("l_suppkey").as("o_lsk"),
        col("l_shipdate").as("o_lsd"))
      l1.join(other,
          col("l_orderkey") === col("o_lok") && col("l_suppkey") =!= col("o_lsk"),
          "left_semi")
        .join(other,
          col("l_orderkey") === col("o_lok") && col("l_suppkey") =!= col("o_lsk") &&
            col("o_lsd") >= col("l_shipdate"),
          "left_anti")
        .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    },

    // X-extension, TPC-H Q15 shape: the "top supplier by quarterly revenue"
    // view — per-supplier revenue aggregate, then keep the max. The rev
    // aggregate is supplier-cardinality (dimension-sized), so the global
    // max rides back as ONE broadcast row + an equality filter: the fact
    // shuffles once on l_suppkey and nothing else is wide. Ties all
    // surface, per the original query's semantics.
    QueryDef(
      "x13_top_supplier",
      """WITH rev AS (SELECT l_suppkey,
        |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4)))
        |      AS DOUBLE) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_rev
        |FROM rev JOIN supplier ON s_suppkey = l_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(ExactAgg.sumExact(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_rev"))
      rev.crossJoin(broadcast(rev.agg(max(col("total_rev")).as("max_rev"))))
        .filter(col("total_rev") === col("max_rev"))
        .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev"))
        .orderBy(col("s_suppkey"))
    },

    // W9: rank-distribution window functions — percent_rank and cume_dist
    // per customer over order value. Both are single-pass window
    // expressions on the same (key, order) spec, so they share one
    // exchange and sort; doubles are fixed-shape divisions of integers
    // (bit-exact across engines).
    QueryDef(
      "w9_rank_distribution",
      """SELECT o_custkey, o_orderkey,
        |  percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // X-extension, TPC-H Q8 shape: market share — each nation's slice of
    // yearly revenue as a ratio-to-report window. Float discipline: the
    // per-(year, nation) revenue AND the per-year window total stay exact
    // DECIMAL through the aggregation and the window (order-proof); doubles
    // appear only in the final one-shot division of two exact values.
    QueryDef(
      "x14_market_share",
      """WITH rev AS (SELECT year(o_orderdate) AS yr, n_name,
        |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4))) AS rev_d
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2)
        |SELECT yr, n_name, CAST(rev_d AS DOUBLE) AS revenue,
        |  CAST(rev_d AS DOUBLE) / CAST(SUM(rev_d) OVER (PARTITION BY yr) AS DOUBLE)
        |    AS share
        |FROM rev ORDER BY yr, n_name""".stripMargin) { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(year(col("o_orderdate")).as("yr"), col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(25,4)")).as("rev_d"))
      val byYear = Window.partitionBy(col("yr"))
      rev.select(col("yr"), col("n_name"),
          col("rev_d").cast("double").as("revenue"),
          (col("rev_d").cast("double") /
            sum(col("rev_d")).over(byYear).cast("double")).as("share"))
        .orderBy(col("yr"), col("n_name"))
    },

    // X-extension, TPC-H Q18 shape: large-quantity orders (HAVING on an
    // exact decimal sum) joined back to orders + customer. Q18's IN
    // (GROUP BY ... HAVING) subquery IS the aggregate — one lineitem
    // exchange on l_orderkey feeds both the filter and the join; the
    // customer dim broadcasts; the top-20 plans as TakeOrderedAndProject.
    QueryDef(
      "x11_big_quantity_orders",
      """WITH big AS (SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS sum_qty
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
        |FROM big JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |WHERE sum_qty > 300
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin) { (s, d) =>
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(ExactAgg.sumExact(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      big.join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(20)
    },

    // X-extension, TPC-H Q20 shape: the nested "more than X times the
    // average supply share" double aggregate — per-(part, supplier) totals
    // compared against a per-part aggregate of those totals. Spark-first
    // form: pre-partition lineitem by l_partkey so the (partkey, suppkey)
    // aggregate AND the per-part window both reuse ONE exchange (a subset
    // of the group keys satisfies the clustered distribution); the naive
    // aggregate-then-join-back form shuffles three times. Quantities are
    // integer-valued, so every sum and the share comparison are exact.
    QueryDef(
      "x12_dominant_suppliers",
      """WITH ps AS (SELECT l_partkey, l_suppkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS q
        |  FROM lineitem GROUP BY 1, 2),
        |shares AS (SELECT l_suppkey, q,
        |    SUM(q) OVER (PARTITION BY l_partkey) AS tot,
        |    COUNT(*) OVER (PARTITION BY l_partkey) AS ns
        |  FROM ps)
        |SELECT s_name, COUNT(*) AS n_dominant
        |FROM shares JOIN supplier ON s_suppkey = l_suppkey
        |WHERE q * ns > 2.0 * tot
        |GROUP BY s_name ORDER BY n_dominant DESC, s_name""".stripMargin) { (s, d) =>
      val byPart = Window.partitionBy(col("l_partkey"))
      Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
        .repartition(col("l_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(ExactAgg.sumExact(col("l_quantity")).as("q"))
        .withColumn("tot", sum(col("q")).over(byPart))
        .withColumn("ns", count(lit(1)).over(byPart))
        .filter(col("q") * col("ns") > lit(2.0) * col("tot"))
        .join(broadcast(Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("n_dominant"))
        .orderBy(col("n_dominant").desc, col("s_name"))
    },

    // X-extension, TPC-H Q1 shape: the pricing summary — one lineitem scan,
    // eight aggregates over two low-cardinality keys. The scan-side filter
    // pushes to parquet; every sum is map-side-combinable decimal (exact at
    // any parallelism); charge carries 6 fractional digits (price x disc x
    // tax), so its decimal widens to (30,6) where the 4-digit sums use
    // (25,4).
    QueryDef(
      "x15_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4))) AS DOUBLE)
        |    AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
        |    AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,4))) AS DOUBLE) / COUNT(l_quantity)
        |    AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,4))) AS DOUBLE) / COUNT(l_extendedprice)
        |    AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(25,4))) AS DOUBLE) / COUNT(l_discount)
        |    AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= DATE '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit(java.sql.Date.valueOf("2001-09-01")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          ExactAgg.sumExact(col("l_quantity")).as("sum_qty"),
          ExactAgg.sumExact(col("l_extendedprice")).as("sum_base_price"),
          ExactAgg.sumExact(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))).cast("decimal(30,6)")).cast("double")
            .as("sum_charge"),
          ExactAgg.meanExact(col("l_quantity")).as("avg_qty"),
          ExactAgg.meanExact(col("l_extendedprice")).as("avg_price"),
          ExactAgg.meanExact(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // X-extension, TPC-H Q6 shape: the forecasting-revenue scan — a single
    // pass with three range predicates that ALL push to the parquet scan
    // (PlanSpec asserts PushedFilters), one exact-decimal sum, no join, no
    // window: the cheapest possible plan for the question.
    QueryDef(
      "x16_forecast_revenue",
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,4)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit(java.sql.Date.valueOf("1996-01-01")) &&
          col("l_shipdate") < lit(java.sql.Date.valueOf("1997-01-01")) &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(ExactAgg.sumExact(col("l_extendedprice") * col("l_discount"))
          .as("revenue"))
    },

    // X-extension, TPC-H Q7 shape: volume shipped between two nations in
    // either direction. The only fact-fact exchange is lineitem-orders on
    // the order key; supplier/customer/nation are filtered THROUGH the
    // two-nation predicate before broadcasting, so the fact stream thins at
    // the broadcast probes, and the direction pair rides as a residual OR
    // on the joined row.
    QueryDef(
      "x17_volume_shipping",
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(SUM(CAST(volume AS DECIMAL(25,4))) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    year(l_shipdate) AS l_year,
        |    l_extendedprice * (1 - l_discount) AS volume
        |  FROM lineitem
        |    JOIN orders ON o_orderkey = l_orderkey
        |    JOIN supplier ON s_suppkey = l_suppkey
        |    JOIN customer ON c_custkey = o_custkey
        |    JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |    JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, d) =>
      val nations = Tables.nation(s, d)
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
      val supp = Tables.supplier(s, d)
        .join(nations, col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = Tables.customer(s, d)
        .join(nations, col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(ExactAgg.sumExact(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // X-extension, TPC-H Q9 shape: the multi-join profit rollup by supplier
    // nation and order year. The fixtures carry no partsupp, so supply cost
    // is the retail-value proxy p_retailprice x l_quantity — same join
    // graph, same decimal-exact profit arithmetic. Plan contract (PlanSpec):
    // part (name-filtered), supplier and nation ALL broadcast; the only
    // fact-fact exchange is lineitem-orders on the order key.
    QueryDef(
      "x18_nation_profit",
      """SELECT nation, o_year,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4))
        |         - CAST(p_retailprice * l_quantity AS DECIMAL(25,4))) AS DOUBLE)
        |    AS profit
        |FROM (
        |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |    l_extendedprice, l_discount, p_retailprice, l_quantity
        |  FROM lineitem
        |    JOIN part ON p_partkey = l_partkey
        |    JOIN supplier ON s_suppkey = l_suppkey
        |    JOIN nation ON s_nationkey = n_nationkey
        |    JOIN orders ON o_orderkey = l_orderkey
        |  WHERE p_name LIKE '%gear%')
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin) { (s, d) =>
      val gearParts = Tables.part(s, d)
        .filter(col("p_name").contains("gear"))
        .select(col("p_partkey"), col("p_retailprice"))
      Tables.lineitem(s, d)
        .join(broadcast(gearParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d)
            .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(25,4)") -
            (col("p_retailprice") * col("l_quantity")).cast("decimal(25,4)"))
          .cast("double").as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // X-extension, TPC-H Q12 shape: late-shipment priority counts — the
    // conditional-aggregation join. The fixtures carry no ship mode or
    // commit/receipt dates, so the group key is the return flag and "late"
    // is shipped > 60 days after order date (the x6 lateness predicate).
    // The CASE sums are exact integers; the date-range filter pushes to the
    // lineitem scan, the lateness predicate rides the join.
    QueryDef(
      "x19_late_priority_counts",
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit(java.sql.Date.valueOf("1997-01-01")) &&
          col("l_shipdate") < lit(java.sql.Date.valueOf("1998-01-01")))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority")),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!isHigh, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    },

    // X-extension, TPC-H Q14 shape: promo revenue share for one ship month
    // — two conditional decimal sums in ONE aggregate over the broadcast
    // part join, then a single double expression both engines evaluate
    // identically. No second scan for the denominator.
    QueryDef(
      "x20_promo_revenue",
      """SELECT (100.0 * promo) / total AS promo_revenue
        |FROM (SELECT
        |  CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4))
        |    ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE) AS promo,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4)))
        |    AS DOUBLE) AS total
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_shipdate >= DATE '1997-09-01' AND l_shipdate < DATE '1997-10-01')""".stripMargin) { (s, d) =>
      val disc = (col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(25,4)")
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit(java.sql.Date.valueOf("1997-09-01")) &&
          col("l_shipdate") < lit(java.sql.Date.valueOf("1997-10-01")))
        .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_type"))),
          col("p_partkey") === col("l_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", disc)
            .otherwise(lit(0).cast("decimal(25,4)"))).cast("double").as("promo"),
          sum(disc).cast("double").as("total"))
        .select(((lit(100.0) * col("promo")) / col("total")).as("promo_revenue"))
    },

    // X-extension, TPC-H Q19 shape: the OR-of-ANDs bracket predicate. The
    // plan contract (PlanSpec) is what this query exists to demonstrate:
    // Catalyst extracts each side's disjunction from the OR — the brand/size
    // brackets reach the part scan, the quantity brackets reach the lineitem
    // scan (PushedFilters on both) — and the cross-side conjunctions ride
    // the broadcast join as a residual. A naive engine evaluates the whole
    // OR after the join and scans both tables in full.
    QueryDef(
      "x21_bracket_revenue",
      """SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity >= 1 AND l_quantity <= 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity >= 10 AND l_quantity <= 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin) { (s, d) =>
      val bracket1 = col("p_brand") === "Brand#12" &&
        col("p_size").between(1, 5) &&
        col("l_quantity") >= 1 && col("l_quantity") <= 11
      val bracket2 = col("p_brand") === "Brand#23" &&
        col("p_size").between(1, 10) &&
        col("l_quantity") >= 10 && col("l_quantity") <= 20
      val bracket3 = col("p_brand") === "Brand#3" &&
        col("p_size").between(1, 15) &&
        col("l_quantity") >= 20 && col("l_quantity") <= 30
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
            .select(col("p_partkey"), col("p_brand"), col("p_size"))),
          col("p_partkey") === col("l_partkey"))
        .filter(bracket1 || bracket2 || bracket3)
        .agg(ExactAgg.sumExact(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
    },

    // X-extension, TPC-H Q10 shape: returned-item revenue — which customers
    // returned the most in a quarter. Completes the 22-query TPC-H shape
    // sweep together with x23. One fact-fact exchange (lineitem-orders);
    // customer and nation broadcast; the date window pushes to the orders
    // scan, the return flag to the lineitem scan; top-20 plans as
    // TakeOrderedAndProject.
    QueryDef(
      "x22_returned_revenue",
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,4)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation ON n_nationkey = c_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-04-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit(java.sql.Date.valueOf("1997-01-01")) &&
              col("o_orderdate") < lit(java.sql.Date.valueOf("1997-04-01")))
            .select(col("o_orderkey"), col("o_custkey")),
          col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_name"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(ExactAgg.sumExact(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey")).limit(20)
    },

    // X-extension, TPC-H Q11 shape: important stock — per-part shipped
    // value from ONE nation's suppliers, kept when it exceeds a fraction of
    // that nation's total (the fixtures carry no partsupp, so shipped
    // l_quantity x p_retailprice is the stock-value proxy). The plan shape
    // Q11 exists for: the same filtered aggregate feeds BOTH the per-part
    // rows and the global scalar, the scalar rides a broadcast nested-loop
    // (one row), and the HAVING compares against it.
    QueryDef(
      "x23_important_stock",
      """WITH pv AS (SELECT l_partkey,
        |    CAST(SUM(CAST(l_quantity * p_retailprice AS DECIMAL(25,4)))
        |      AS DOUBLE) AS value
        |  FROM lineitem
        |    JOIN part ON p_partkey = l_partkey
        |    JOIN supplier ON s_suppkey = l_suppkey
        |    JOIN nation ON n_nationkey = s_nationkey
        |  WHERE n_name = 'NATION_3'
        |  GROUP BY l_partkey)
        |SELECT l_partkey, value
        |FROM pv WHERE value >
        |  (SELECT CAST(SUM(CAST(value AS DECIMAL(25,4))) AS DOUBLE) * 0.001 FROM pv)
        |ORDER BY value DESC, l_partkey""".stripMargin) { (s, d) =>
      val nationSupp = Tables.supplier(s, d)
        .join(Tables.nation(s, d).filter(col("n_name") === "NATION_3"),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val pv = Tables.lineitem(s, d)
        .join(broadcast(nationSupp), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.part(s, d)
            .select(col("p_partkey"), col("p_retailprice"))),
          col("p_partkey") === col("l_partkey"))
        .groupBy(col("l_partkey"))
        .agg(ExactAgg.sumExact(col("l_quantity") * col("p_retailprice"))
          .as("value"))
      // re-sum through decimal: each value carries <= 4 fractional digits,
      // so the double -> decimal cast recovers it exactly and the global
      // sum stays order-independent (a bare double SUM would differ from
      // the oracle's single-threaded fold in the last ulp)
      val threshold = pv.agg((ExactAgg.sumExact(col("value")) * 0.001).as("thr"))
      pv.join(broadcast(threshold))
        .filter(col("value") > col("thr")).drop("thr")
        .orderBy(col("value").desc, col("l_partkey"))
    }
  )
}
