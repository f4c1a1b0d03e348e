package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Analytics query registry over the TPC-H-ish corpus (TESTDATA.md).
  *
  * Each query is a `(SparkSession, sfDir) => DataFrame` paired with a
  * DuckDB oracle SQL over the same parquet tables. See SparkEntry for
  * the determinism conventions (decimal-exact sums, aliased columns,
  * ordered output).
  *
  * Scale notes are per-query; the common posture: an explicit
  * `broadcast()` hint is reserved for FIXED-cardinality dims (region
  * 5 rows, nation 25 — constant at every SF). Tables that scale with
  * SF (customer/supplier/part) are never hint-pinned: at 100 TB a
  * forced broadcast of a ~15 B-row customer OOMs the driver, so their
  * join strategy is left to AQE's size-gated
  * autoBroadcastJoinThreshold — broadcast while genuinely small,
  * shuffle join beyond it (PlanShapeSpec pins both regimes).
  * Fact-side filters sit directly on the scan so parquet pushdown
  * prunes IO, and aggregations rely on map-side partial aggregation
  * so the single shuffle carries only group keys.
  */
object AnalyticsQueries {

  private val dec = DecimalType(18, 6)

  /** Exact decimal sum of a per-row double expression, emitted as double. */
  private def dsum(e: Column): Column = sum(e.cast(dec)).cast("double")

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ------------------------------------------------------------------ q1

  /** TPC-H Q1-style pricing summary: single shuffle on the two
    * low-cardinality flags; partial aggregation map-side keeps the
    * shuffle tiny regardless of input scale. */
  private def q1(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        (dsum($"l_quantity") / count(lit(1))).as("avg_qty"),
        (dsum($"l_extendedprice") / count(lit(1))).as("avg_price"),
        (dsum($"l_discount") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ------------------------------------------------------------------ q3

  /** TPC-H Q3-style shipping priority: two selective scans, shuffle
    * join on orderkey. The filtered-customer side is NOT hint-pinned:
    * customer scales with SF (≈15 B rows at 100 TB — a forced
    * broadcast OOMs the driver), so AQE's size-gated
    * autoBroadcastJoinThreshold picks broadcast while the side is
    * genuinely small and falls back to a shuffle join beyond it.
    * Top-k is TakeOrderedAndProject — no global sort
    * materialization. */
  private def q3(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cutoff = lit(java.sql.Date.valueOf("1998-06-15"))
    val cust = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val ord = t(s, dir, "orders").filter($"o_orderdate" < cutoff)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val li = t(s, dir, "lineitem").filter($"l_shipdate" > cutoff)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  private val q3Sql =
    """SELECT l_orderkey, o_orderdate,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < DATE '1998-06-15'
      |  AND l_shipdate > DATE '1998-06-15'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // ------------------------------------------------------------------ q4

  /** TPC-H Q4-style order-priority check: EXISTS as a left-semi join
    * (no row multiplication, lineitem side reduced before the join). */
  private def q4(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = t(s, dir, "orders")
      .filter($"o_orderdate" >= lit(java.sql.Date.valueOf("1997-01-01")) &&
        $"o_orderdate" < lit(java.sql.Date.valueOf("1998-01-01")))
    val late = t(s, dir, "lineitem").select($"l_orderkey", $"l_shipdate")
    ord.join(late,
        ord("o_orderkey") === late("l_orderkey") && late("l_shipdate") > ord("o_orderdate"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy($"o_orderpriority")
  }

  private val q4Sql =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ------------------------------------------------------------------ q5

  /** TPC-H Q5-style regional volume. Only the FIXED-cardinality dims
    * (region 5 rows, nation 25) carry an explicit broadcast hint;
    * customer and supplier scale linearly with SF, so their join
    * strategy is left to AQE's size gate — broadcast while they fit
    * under autoBroadcastJoinThreshold (true at bench SFs), shuffle
    * join at warehouse scale where a forced broadcast would OOM the
    * driver. The fact-fact join on orderkey is the one inherent
    * shuffle (the layout a 100 TB deployment would pre-bucket —
    * BucketingSpec proves the co-located variant). */
  private def q5(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nations = t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region").filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val cust = t(s, dir, "customer").select($"c_custkey", $"c_nationkey")
    val supp = t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")
    val ord = t(s, dir, "orders")
      .filter($"o_orderdate" >= lit(java.sql.Date.valueOf("1996-01-01")) &&
        $"o_orderdate" < lit(java.sql.Date.valueOf("1998-01-01")))
      .select($"o_orderkey", $"o_custkey")
    val li = t(s, dir, "lineitem")
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust, $"o_custkey" === $"c_custkey")
      .join(supp,
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nations), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  private val q5Sql =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------- brand revenue

  /** Part-dim join + two-level group, one agg shuffle. Part scales
    * with SF, so the join strategy is AQE's size-gated choice, not a
    * pinned broadcast (see class doc). */
  private def qBrand(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val part = t(s, dir, "part").select($"p_partkey", $"p_brand")
    t(s, dir, "lineitem")
      .select($"l_partkey", $"l_extendedprice", $"l_discount", $"l_quantity")
      .join(part, $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        dsum($"l_quantity").as("total_qty"),
        count(lit(1)).as("n_lines"))
      .orderBy($"p_brand")
  }

  private val qBrandSql =
    """SELECT p_brand,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- rollup

  /** ROLLUP with grouping() marker — exercises grouping sets.
    *
    * Two-level form (r14, guide §2.3 "aggregate before you shuffle"):
    * Catalyst plans rollup/cube as Expand-then-aggregate, so the
    * single-level spelling pushed 3× (rollup) / 4× (cube) of EVERY
    * lineitem row — decimal casts included — through the Expand and
    * the partial aggregate. Pre-aggregating at the finest grain first
    * collapses the corpus to the ~|flag×status| group table, then the
    * rollup expands only that tiny aggregate. Decimal sums re-sum
    * exactly (associative, Decimal(28,6) partials into (38,6)) and
    * counts sum, so the result is bit-identical to the direct form —
    * the unchanged oracle still does the one-level GROUP BY ROLLUP.
    * Measured min-of-N: rollup sf0.1 0.86 → 0.57 s, sf10 3.5 → 2.5 s;
    * cube sf0.1 1.11 → 0.64 s, sf10 4.6 → 2.7 s. */
  private def qRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = t(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity".cast(dec)).as("q"), count(lit(1)).as("cn"))
    base.rollup($"l_returnflag", $"l_linestatus")
      .agg(sum($"q").cast("double").as("sum_qty"), sum($"cn").as("n"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"sum_qty", $"n")
      .orderBy($"returnflag", $"linestatus")
  }

  private val qRollupSql =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  /** CUBE over the same flags — all four grouping-set combinations in
    * one pass (ROLLUP's sibling; Spark expands both to a single
    * Expand + hash aggregate, so it is still one shuffle). */
  private def qCube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // two-level like qRollup (r14): pre-aggregate at the finest grain,
    // cube-expand only the tiny group table — bit-identical decimals
    val base = t(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity".cast(dec)).as("q"), count(lit(1)).as("cn"))
    base.cube($"l_returnflag", $"l_linestatus")
      .agg(sum($"q").cast("double").as("sum_qty"), sum($"cn").as("n"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"sum_qty", $"n")
      .orderBy($"returnflag", $"linestatus")
  }

  private val qCubeSql =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin

  // --------------------------------------------------------- distinct aggs

  /** Exact distinct counts + min/max per group. */
  private def qDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy($"event_type")
      .agg(
        countDistinct($"user_id").as("n_users"),
        count(lit(1)).as("n_events"),
        min($"value").as("min_value"),
        max($"value").as("max_value"))
      .orderBy($"event_type")
  }

  private val qDistinctSql =
    """SELECT event_type,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  COUNT(*) AS n_events,
      |  MIN(value) AS min_value,
      |  MAX(value) AS max_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------ statistics

  /** Moment statistics computed from exact decimal sums so variance is
    * reproducible double arithmetic on both engines (avoids engine
    *-specific streaming-variance accumulation orders). */
  private def qStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        dsum($"value").as("sum_value"),
        dsum($"value" * $"value").as("sum_sq"))
      .select(
        $"event_type", $"n", $"sum_value",
        ($"sum_value" / $"n").as("mean_value"),
        (($"sum_sq" - $"sum_value" * $"sum_value" / $"n") / ($"n" - lit(1))).as("var_value"))
      .orderBy($"event_type")
  }

  private val qStatsSql =
    """WITH a AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
      |    CAST(SUM(CAST(value * value AS DECIMAL(18,6))) AS DOUBLE) AS sum_sq
      |  FROM events GROUP BY event_type)
      |SELECT event_type, n, sum_value,
      |  sum_value / n AS mean_value,
      |  (sum_sq - sum_value * sum_value / n) / (n - 1) AS var_value
      |FROM a ORDER BY event_type""".stripMargin

  // -------------------------------------------------------------- windows

  /** Per-user ordered window: row_number, lag delta, running sum.
    * One shuffle on user_id; all three functions share one window
    * frame so Spark evaluates them in a single WindowExec pass. */
  private def qWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    t(s, dir, "events")
      .filter($"user_id" < 50)
      .select($"user_id", $"event_id", $"ts", $"value")
      .withColumn("seq", row_number().over(w).cast("long"))
      .withColumn("gap_seconds",
        (unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w))).cast("double") / 1e6)
      .withColumn("running_value",
        sum($"value".cast(dec)).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double"))
      .orderBy($"user_id", $"seq")
  }

  private val qWindowSql =
    """SELECT user_id, event_id, ts, value,
      |  row_number() OVER w AS seq,
      |  CAST(epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS DOUBLE) / 1e6 AS gap_seconds,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      |FROM events
      |WHERE user_id < 50
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, seq""".stripMargin

  // --------------------------------------------------------- sessionization

  /** Gap-based sessionization (30 min) via lag + conditional cumsum —
    * the classic two-window formulation; both windows hash-partition
    * by user_id only, so a single shuffle serves the whole query. */
  private def qSessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    t(s, dir, "events")
      .select($"user_id", $"event_id", $"ts", $"value")
      .withColumn("prev_ts", lag($"ts", 1).over(byUser))
      .withColumn("new_session",
        when($"prev_ts".isNull ||
          unix_micros($"ts") - unix_micros($"prev_ts") > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum($"new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        dsum($"value").as("session_value"),
        min($"ts").as("session_start"),
        max($"ts").as("session_end"))
      .orderBy($"user_id", $"session_seq")
  }

  private val qSessionsSql =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts, 1) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) > 30*60*1000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, event_id, ts, value,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      |  FROM flagged)
      |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS session_value,
      |  MIN(ts) AS session_start,
      |  MAX(ts) AS session_end
      |FROM sessions
      |GROUP BY session_seq, user_id
      |ORDER BY user_id, session_seq""".stripMargin

  // ------------------------------------------------------------------ json

  /** Semi-structured extraction: JSON props → typed column → agg. */
  private def qJson(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .withColumn("k_bucket", $"k" % 10)
      .groupBy($"k_bucket")
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .orderBy($"k_bucket")
  }

  private val qJsonSql =
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY k_bucket ORDER BY k_bucket""".stripMargin

  // --------------------------------------------------------------- set ops

  /** Set operation: users who clicked but never purchased (EXCEPT). */
  private def qSetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    ev.filter($"event_type" === "click").select($"user_id")
      .except(ev.filter($"event_type" === "purchase").select($"user_id"))
      .orderBy($"user_id")
  }

  private val qSetOpsSql =
    """SELECT user_id FROM events WHERE event_type = 'click'
      |EXCEPT
      |SELECT user_id FROM events WHERE event_type = 'purchase'
      |ORDER BY user_id""".stripMargin

  // ------------------------------------------------------- top-k per group

  /** Rank-in-group top-k: top 3 orders per customer by totalprice.
    * Window + filter; partition pruning keeps output bounded. */
  private def qTopPerGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    t(s, dir, "orders")
      .filter($"o_custkey" < 100)
      .withColumn("rank_in_cust", row_number().over(w).cast("long"))
      .filter($"rank_in_cust" <= 3)
      .select($"o_custkey", $"rank_in_cust", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rank_in_cust")
  }

  private val qTopPerGroupSql =
    """SELECT o_custkey,
      |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_cust,
      |  o_orderkey, o_totalprice
      |FROM orders
      |WHERE o_custkey < 100
      |QUALIFY rank_in_cust <= 3
      |ORDER BY o_custkey, rank_in_cust""".stripMargin

  // -------------------------------------------------------------- asof join

  /** Point-in-time lookup: each purchase gets the user's most recent
    * click at-or-before it (graft.operators.AsOfJoin — union-sort
    * formulation, one shuffle; DuckDB's native ASOF JOIN is the
    * oracle). Missing matches are pinned to sentinel values so both
    * engines emit identical non-null columns. */
  private def qAsOf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts",
        $"event_id".as("last_click_id"), $"ts".as("last_click_ts"))
    graft.operators.AsOfJoin(purchases, clicks, "user_id", "ts", "ts",
      Seq("last_click_id", "last_click_ts"))
      .select($"event_id", $"user_id", $"ts",
        coalesce($"last_click_id", lit(-1L)).as("last_click_id"),
        coalesce($"last_click_ts", lit("1970-01-01 00:00:00").cast("timestamp"))
          .as("last_click_ts"))
      .orderBy($"event_id")
  }

  private val qAsOfSql =
    """SELECT p.event_id, p.user_id, p.ts,
      |  COALESCE(c.event_id, -1) AS last_click_id,
      |  COALESCE(c.ts, TIMESTAMP '1970-01-01 00:00:00') AS last_click_ts
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND c.ts <= p.ts
      |ORDER BY p.event_id""".stripMargin

  /** As-of with a freshness tolerance: same lookup as q_asof, but a
    * click more than 30 minutes older than the purchase is no match
    * (pandas merge_asof `tolerance` semantics — the staleness guard
    * every feature-lookup pipeline wants). One projection on top of
    * the same single-shuffle as-of plan. */
  private def qAsOfTolerance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts",
        $"event_id".as("last_click_id"), $"ts".as("last_click_ts"))
    graft.operators.AsOfJoin(purchases, clicks, "user_id", "ts", "ts",
      Seq("last_click_id", "last_click_ts"),
      tolerance = Some(expr("INTERVAL 30 MINUTES")))
      .select($"event_id", $"user_id", $"ts",
        coalesce($"last_click_id", lit(-1L)).as("last_click_id"),
        coalesce($"last_click_ts", lit("1970-01-01 00:00:00").cast("timestamp"))
          .as("last_click_ts"))
      .orderBy($"event_id")
  }

  private val qAsOfToleranceSql =
    """WITH j AS (
      |  SELECT p.event_id, p.user_id, p.ts,
      |    c.event_id AS click_id, c.ts AS click_ts
      |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |    ON p.user_id = c.user_id AND c.ts <= p.ts)
      |SELECT event_id, user_id, ts,
      |  COALESCE(CASE WHEN click_ts >= ts - INTERVAL 30 MINUTE THEN click_id END,
      |           -1) AS last_click_id,
      |  COALESCE(CASE WHEN click_ts >= ts - INTERVAL 30 MINUTE THEN click_ts END,
      |           TIMESTAMP '1970-01-01 00:00:00') AS last_click_ts
      |FROM j ORDER BY event_id""".stripMargin

  // ------------------------------------------------------------------ pivot

  /** Pivot: per-user event-type counts as columns. The value set is
    * declared (no extra distinct pass) — at scale an undeclared pivot
    * is a hidden collect. */
  private def qPivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val types = Seq("click", "view", "purchase", "error", "signup")
    val pivoted = t(s, dir, "events")
      .filter($"user_id" < 100)
      .groupBy($"user_id")
      .pivot("event_type", types)
      .count()
    types.foldLeft(pivoted) { (df, ty) =>
      df.withColumn(s"n_$ty", coalesce(col(ty), lit(0L))).drop(ty)
    }.orderBy($"user_id")
  }

  private val qPivotSql =
    """SELECT user_id,
      |  COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
      |  COUNT(*) FILTER (WHERE event_type = 'view') AS n_view,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
      |  COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup
      |FROM events WHERE user_id < 100
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  // ----------------------------------------------------- tumbling batch agg

  /** Batch tumbling window: hourly counts+sums via date_trunc (the
    * streaming twin lives in graft.streaming.StreamingEtl). */
  private def qHourly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .orderBy($"hour", $"event_type")
  }

  private val qHourlySql =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY hour, event_type
      |ORDER BY hour, event_type""".stripMargin

  // ------------------------------------------------------- quantiles, argmax

  /** Exact interpolated percentiles + arg-min/max per group. Spark's
    * `percentile` and DuckDB's `quantile_cont` share the (n-1)·q
    * interpolation definition; min_by/max_by tie-break is pinned by
    * unique values in this corpus. */
  private def qQuantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .groupBy($"event_type")
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        min_by($"event_id", $"value").as("cheapest_event"),
        max_by($"event_id", $"value").as("priciest_event"))
      .orderBy($"event_type")
  }

  private val qQuantilesSql =
    """SELECT event_type,
      |  quantile_cont(value, 0.5) AS p50,
      |  quantile_cont(value, 0.9) AS p90,
      |  min_by(event_id, value) AS cheapest_event,
      |  max_by(event_id, value) AS priciest_event
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------- string/array functions

  /** Scalar-function coverage sweep: string ops, array construction,
    * conditional logic — one row per customer, every expression
    * deterministic and engine-portable. */
  private def qScalarFns(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .filter($"c_custkey" <= 50)
      .select(
        $"c_custkey",
        upper($"c_name").as("name_upper"),
        length($"c_name").cast("long").as("name_len"),
        substring($"c_name", 1, 8).as("name_prefix"),
        concat_ws("|", $"c_mktsegment", $"c_name").as("seg_name"),
        regexp_replace($"c_name", "[0-9]", "#").as("name_masked"),
        when($"c_acctbal" < 0, "overdrawn")
          .when($"c_acctbal" < 5000, "standard")
          .otherwise("premium").as("tier"),
        round($"c_acctbal" / 1000.0, 2).as("bal_k"),
        array_join(sort_array(split($"c_mktsegment", "")), "").as("seg_sorted"))
      .orderBy($"c_custkey")
  }

  private val qScalarFnsSql =
    """SELECT c_custkey,
      |  upper(c_name) AS name_upper,
      |  CAST(length(c_name) AS BIGINT) AS name_len,
      |  substr(c_name, 1, 8) AS name_prefix,
      |  concat_ws('|', c_mktsegment, c_name) AS seg_name,
      |  regexp_replace(c_name, '[0-9]', '#', 'g') AS name_masked,
      |  CASE WHEN c_acctbal < 0 THEN 'overdrawn'
      |       WHEN c_acctbal < 5000 THEN 'standard'
      |       ELSE 'premium' END AS tier,
      |  round(c_acctbal / 1000.0, 2) AS bal_k,
      |  array_to_string(list_sort(string_split_regex(c_mktsegment, '')), '') AS seg_sorted
      |FROM customer WHERE c_custkey <= 50 ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------- interval join

  /** Batch interval join (the streaming purchaseAttribution twin):
    * per purchase, how many clicks the same user made in the
    * preceding hour. Equi-key on user plus a range predicate — Spark
    * plans the equi-part as the join key so the range check runs
    * within user groups, not as a cross product. */
  private def qAttribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("click_ts"))
    purchases.join(clicks,
        $"user_id" === $"c_user" &&
          $"click_ts" >= $"ts" - expr("INTERVAL 1 HOUR") && $"click_ts" <= $"ts",
        "left")
      .groupBy($"event_id")
      .agg(count($"click_ts").as("n_clicks_prior_hour"))
      .orderBy($"event_id")
  }

  private val qAttributionSql =
    """SELECT p.event_id, COUNT(c.ts) AS n_clicks_prior_hour
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
      |GROUP BY p.event_id
      |ORDER BY p.event_id""".stripMargin

  // ------------------------------------------------------ date extraction

  /** Calendar-function sweep: year/quarter/month/dow extraction and
    * grouping — the time-dimension workhorse. */
  private def qCalendar(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "orders")
      .groupBy(
        year($"o_orderdate").as("y"),
        quarter($"o_orderdate").as("q"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum($"o_totalprice").as("revenue"),
        countDistinct(dayofweek($"o_orderdate")).as("active_dows"))
      .orderBy($"y", $"q")
  }

  private val qCalendarSql =
    """SELECT CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(quarter(o_orderdate) AS INT) AS q,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
      |  COUNT(DISTINCT dayofweek(o_orderdate)) AS active_dows
      |FROM orders GROUP BY y, q ORDER BY y, q""".stripMargin

  // ------------------------------------------------- min-per-group join

  /** TPC-H Q2-flavored: per part, the supplier with the lowest total
    * lineitem revenue (argmin inside a group over a join) — the
    * nested-agg + window shape. One shuffle for the (part,supp) agg,
    * one for the per-part window. */
  private def q2min(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perSupp = t(s, dir, "lineitem")
      .filter($"l_partkey" <= 50)
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("supp_revenue"))
    val w = Window.partitionBy($"l_partkey")
      .orderBy($"supp_revenue", $"l_suppkey")
    perSupp
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"l_partkey", $"l_suppkey".as("cheapest_supp"), $"supp_revenue")
      .orderBy($"l_partkey")
  }

  private val q2minSql =
    """WITH r AS (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS supp_revenue
      |  FROM lineitem WHERE l_partkey <= 50
      |  GROUP BY l_partkey, l_suppkey)
      |SELECT l_partkey, l_suppkey AS cheapest_supp, supp_revenue FROM r
      |QUALIFY row_number() OVER (PARTITION BY l_partkey ORDER BY supp_revenue, l_suppkey) = 1
      |ORDER BY l_partkey""".stripMargin

  // -------------------------------------------------- correlated subquery

  /** TPC-H Q17-style small-quantity revenue: the correlated per-part
    * average decorrelates into a groupBy + join on partkey. Neither
    * the brand's part list nor the per-part averages carry a
    * broadcast hint — both grow with SF (the brand is a constant
    * FRACTION of the part table, not a constant size), so AQE's size
    * gate broadcasts them while small and shuffles beyond the
    * threshold. Threshold arithmetic uses the decimal-exact average
    * so both engines compare against the identical double. */
  private def q17(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val partFiltered = t(s, dir, "part")
      .filter($"p_brand" === "Brand#23").select($"p_partkey")
    // restrict lineitem to the brand's parts BEFORE the per-part
    // average: the correlated average only matters for those parts,
    // so the aggregation shrinks from all parts to the brand's
    val relevant = t(s, dir, "lineitem")
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      .join(partFiltered, $"l_partkey" === $"p_partkey")
    val avgQty = relevant.groupBy($"l_partkey".as("ap_partkey"))
      .agg((dsum($"l_quantity") / count(lit(1))).as("avg_qty"))
    relevant.join(avgQty, $"l_partkey" === $"ap_partkey")
      .filter($"l_quantity" < lit(0.2) * $"avg_qty")
      .agg((dsum($"l_extendedprice") / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_small_lines"))
  }

  private val q17Sql =
    """SELECT
      |  CAST(SUM(CAST(l1.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0 AS avg_yearly,
      |  COUNT(*) AS n_small_lines
      |FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
      |WHERE p_brand = 'Brand#23'
      |  AND l1.l_quantity < (
      |    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
      |    FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin

  // ----------------------------------------------------------- array aggs

  /** Array aggregation: per-type sorted distinct user list (sorted so
    * the collect order — nondeterministic in any distributed engine —
    * can't leak into the result). The list is serialized to a
    * comma-joined string because the harness's pandas-side comparison
    * cannot hash array cells; the string is a deterministic function of
    * the same set. */
  private def qArrayAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events")
      .filter($"user_id" < 30)
      .groupBy($"event_type")
      .agg(sort_array(collect_set($"user_id")).as("user_set"))
      .select(
        $"event_type",
        array_join($"user_set", ",").as("users"),
        size($"user_set").cast("long").as("n_users"))
      .orderBy($"event_type")
  }

  private val qArrayAggSql =
    """SELECT event_type,
      |  array_to_string(list_sort(list(DISTINCT user_id)), ',') AS users,
      |  CAST(len(list_sort(list(DISTINCT user_id))) AS BIGINT) AS n_users
      |FROM events WHERE user_id < 30
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // --------------------------------------------- q9-style nation profit

  /** Revenue by supplier nation × order year: nation (fixed 25 rows)
    * is hint-broadcast; supplier scales with SF so its strategy is
    * AQE's size-gated choice (broadcast at bench SFs, shuffle join at
    * warehouse scale). Plus ONE fact-fact shuffle join
    * (lineitem⋈orders on orderkey — both sides hash-partition on the
    * key, the layout a 100 TB deployment would pre-bucket). Rollup
    * shuffle carries only (nation, year) partial sums. */
  private def qNationProfit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .join(t(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(t(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
      .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name".as("nation"), year($"o_orderdate").cast("long").as("o_year"))
      .agg(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("profit"))
      .orderBy($"nation", $"o_year")
  }

  private val qNationProfitSql =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS profit
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY n_name, year(o_orderdate)
      |ORDER BY nation, o_year""".stripMargin

  // --------------------------------------------- q18-style large orders

  /** Orders whose total quantity clears a threshold, with their
    * customer: agg-then-join (the aggregate output is tiny, so the
    * subsequent joins are effectively dim joins), top-100 via
    * TakeOrdered — no global sort. */
  private def qLargeOrders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = t(s, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(dsum($"l_quantity").as("total_qty"))
      .filter($"total_qty" > 180.0)
    big
      .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .select($"c_name", $"o_orderkey", $"o_totalprice", $"total_qty")
      .orderBy($"total_qty".desc, $"o_orderkey")
      .limit(100)
  }

  private val qLargeOrdersSql =
    """SELECT c_name, o_orderkey, o_totalprice, total_qty
      |FROM (
      |  SELECT l_orderkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey) b
      |JOIN orders ON b.l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE total_qty > 180.0
      |ORDER BY total_qty DESC, o_orderkey
      |LIMIT 100""".stripMargin

  // ------------------------------- q22-style idle high-balance customers

  /** Above-average-balance customers with no recent orders: a scalar
    * aggregate broadcast against the customer scan (no collect; the
    * one-row average rides a broadcast nested-loop), then a LEFT ANTI
    * join against the date-filtered orders (filter pushed to the
    * orders scan). The average is decimal-exact so the threshold
    * comparison is engine-independent. */
  private def qIdleRich(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer")
    val avgBal = c.agg((dsum($"c_acctbal") / count(lit(1))).as("__avg_bal"))
    val recent = t(s, dir, "orders").filter($"o_orderdate" >= lit("1998-06-01"))
    c.crossJoin(broadcast(avgBal))
      .filter($"c_acctbal" > $"__avg_bal")
      .join(recent, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .orderBy($"c_custkey")
  }

  private val qIdleRichSql =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer
      |WHERE c_acctbal > (
      |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
      |    FROM customer)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1998-06-01')
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- registry

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary"   -> (q1 _),
    "q3_shipping_priority" -> (q3 _),
    "q4_order_priority"    -> (q4 _),
    "q5_region_volume"     -> (q5 _),
    "q_brand_revenue"      -> (qBrand _),
    "q_rollup_qty"         -> (qRollup _),
    "q_cube_qty"           -> (qCube _),
    "q_distinct_users"     -> (qDistinct _),
    "q_value_stats"        -> (qStats _),
    "q_user_windows"       -> (qWindow _),
    "q_sessionize"         -> (qSessions _),
    "q_json_props"         -> (qJson _),
    "q_click_not_purchase" -> (qSetOps _),
    "q_top_orders_per_cust" -> (qTopPerGroup _),
    "q_asof_last_click"    -> (qAsOf _),
    "q_asof_tolerance"     -> (qAsOfTolerance _),
    "q_pivot_user_events"  -> (qPivot _),
    "q_hourly_tumbling"    -> (qHourly _),
    "q_quantiles_argmax"   -> (qQuantiles _),
    "q_scalar_functions"   -> (qScalarFns _),
    "q_array_agg"          -> (qArrayAgg _),
    "q17_small_qty_revenue" -> (q17 _),
    "q2_cheapest_supplier"  -> (q2min _),
    "q_attribution_batch"   -> (qAttribution _),
    "q_calendar_rollup"     -> (qCalendar _),
    "q9_nation_profit"      -> (qNationProfit _),
    "q18_large_orders"      -> (qLargeOrders _),
    "q22_idle_rich"         -> (qIdleRich _))

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary"   -> q1Sql,
    "q3_shipping_priority" -> q3Sql,
    "q4_order_priority"    -> q4Sql,
    "q5_region_volume"     -> q5Sql,
    "q_brand_revenue"      -> qBrandSql,
    "q_rollup_qty"         -> qRollupSql,
    "q_cube_qty"           -> qCubeSql,
    "q_distinct_users"     -> qDistinctSql,
    "q_value_stats"        -> qStatsSql,
    "q_user_windows"       -> qWindowSql,
    "q_sessionize"         -> qSessionsSql,
    "q_json_props"         -> qJsonSql,
    "q_click_not_purchase" -> qSetOpsSql,
    "q_top_orders_per_cust" -> qTopPerGroupSql,
    "q_asof_last_click"    -> qAsOfSql,
    "q_asof_tolerance"     -> qAsOfToleranceSql,
    "q_pivot_user_events"  -> qPivotSql,
    "q_hourly_tumbling"    -> qHourlySql,
    "q_quantiles_argmax"   -> qQuantilesSql,
    "q_scalar_functions"   -> qScalarFnsSql,
    "q_array_agg"          -> qArrayAggSql,
    "q17_small_qty_revenue" -> q17Sql,
    "q2_cheapest_supplier"  -> q2minSql,
    "q_attribution_batch"   -> qAttributionSql,
    "q_calendar_rollup"     -> qCalendarSql,
    "q9_nation_profit"      -> qNationProfitSql,
    "q18_large_orders"      -> qLargeOrdersSql,
    "q22_idle_rich"         -> qIdleRichSql)
}
