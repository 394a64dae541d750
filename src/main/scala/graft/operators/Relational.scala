package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational core over the testdata star schema (TPC-H-ish shapes).
  *
  * Exactness discipline shared with the DuckDB oracles: monetary
  * doubles are 2-decimal → scale to integer cents before summing, so
  * every aggregate is order-independent and bit-identical; divide by
  * the scale once at the end. Timestamps are never emitted raw
  * (Spark=µs vs DuckDB=ns) — they leave as formatted strings or epoch
  * seconds.
  *
  * Scale notes: dimension tables (region/nation/customer/supplier) are
  * broadcast; the fact-side scans keep filters pushed to parquet; AQE
  * handles skew/coalescing on a real cluster.
  */
object Relational {
  private def cents(c: String) = round(col(c) * 100).cast("long")

  /** TPC-H Q1-shaped pricing summary. */
  def q1Pricing(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val c = cents("l_extendedprice")
    val d = cents("l_discount") // 0..10 (discount is 2-dec ≤ 0.10)
    val t = cents("l_tax")
    val qty = col("l_quantity").cast("long")
    val cnt = count(lit(1))
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(qty).as("sum_qty"),
        (sum(c).cast("double") / 100.0).as("sum_base_price"),
        (sum(c * (lit(100L) - d)).cast("double") / 10000.0).as("sum_disc_price"),
        (sum(c * (lit(100L) - d) * (lit(100L) + t)).cast("double") / 1000000.0).as("sum_charge"),
        (sum(qty).cast("double") / cnt.cast("double")).as("avg_qty"),
        (sum(c).cast("double") / cnt.cast("double") / 100.0).as("avg_price"),
        (sum(d).cast("double") / cnt.cast("double") / 100.0).as("avg_disc"),
        cnt.as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      | CAST(sum(c) AS DOUBLE)/100.0 AS sum_base_price,
      | CAST(sum(c*(100-d)) AS DOUBLE)/10000.0 AS sum_disc_price,
      | CAST(sum(c*(100-d)*(100+t)) AS DOUBLE)/1000000.0 AS sum_charge,
      | CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS avg_qty,
      | CAST(sum(c) AS DOUBLE)/CAST(count(*) AS DOUBLE)/100.0 AS avg_price,
      | CAST(sum(d) AS DOUBLE)/CAST(count(*) AS DOUBLE)/100.0 AS avg_disc,
      | count(*) AS count_order
      |FROM (SELECT *,
      |        CAST(round(l_extendedprice*100) AS BIGINT) AS c,
      |        CAST(round(l_discount*100) AS BIGINT) AS d,
      |        CAST(round(l_tax*100) AS BIGINT) AS t
      |      FROM lineitem)
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  /** TPC-H Q3-shaped top-10 revenue orders (broadcast customer dim). */
  def q3RevenueTopN(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"),
        (cents("l_extendedprice") * (lit(100L) - cents("l_discount"))).as("rev"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"))
      .agg((sum(col("rev")).cast("double") / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
      .select("o_orderkey", "o_orderdate", "revenue")
  }

  val q3RevenueTopNSql: String =
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)*(100-CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      | JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l_shipdate  > TIMESTAMP '1998-01-01'
      |GROUP BY 1,2 ORDER BY revenue DESC, o_orderkey ASC LIMIT 10""".stripMargin

  /** TPC-H Q5-shaped revenue by nation within one region. */
  def q5NationRevenue(s: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
    val nation = Tables.load(s, dir, "nation")
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val supp = Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val li = Tables.load(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"),
      (cents("l_extendedprice") * (lit(100L) - cents("l_discount"))).as("rev"))
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select("o_orderkey")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg((sum(col("rev")).cast("double") / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5NationRevenueSql: String =
    """SELECT n_name,
      | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)*(100-CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 AS revenue
      |FROM lineitem
      | JOIN orders   ON l_orderkey = o_orderkey
      | JOIN supplier ON l_suppkey = s_suppkey
      | JOIN nation   ON s_nationkey = n_nationkey
      | JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin

  /** Top-3 orders per customer by price (window rank). */
  def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(cents("o_totalprice").desc, col("o_orderkey").asc)
    ord.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy("o_custkey", "rn")
  }

  val qWindowRankSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
      | SELECT *, row_number() OVER (
      |   PARTITION BY o_custkey
      |   ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC, o_orderkey ASC) AS rn
      | FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** 30-minute-gap sessionization over the events table (batch twin of
    * the Structured Streaming flatMapGroupsWithState version). */
  def eventsSessionize(s: SparkSession, dir: String): DataFrame = {
    // ts arrives as nanos-since-epoch (LongType, see Tables.load) —
    // all gap/session math is exact integer arithmetic. Floor to µs
    // first (identity on MICROS-precision drops): DuckDB reads a
    // TIMESTAMP(NANOS) drop at µs precision, so a gap straddling the
    // 1800 s threshold by <1 µs — or a same-µs tie ordered by the ns
    // tail — would otherwise split sessions differently from the
    // oracle (the events_asof discipline).
    val ev = Tables.load(s, dir, "events")
      .select(col("user_id"), expr("ts div 1000 * 1000").as("ts"),
        col("event_id"), cents("value").as("vc"))
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val prev = lag(col("ts"), 1).over(wOrd)
    val isNew = when(prev.isNull ||
      col("ts") - prev > 1800L * 1000000000L, 1L).otherwise(0L)
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("sess_id", sum(isNew).over(wCum))
      .groupBy("user_id", "sess_id")
      .agg(
        min(col("ts")).as("min_ts"),
        count(lit(1)).as("n_events"),
        sum(col("vc")).as("sum_value_cents"))
      // `div` = integer division: ts ≈ 1.7e18 ns exceeds double's exact
      // integer range, so `/` (double divide) would corrupt the second.
      .select(col("user_id"), col("sess_id"),
        expr("min_ts div 1000000000").as("session_start"),
        col("n_events"), col("sum_value_cents"))
      .orderBy("user_id", "sess_id")
  }

  val eventsSessionizeSql: String =
    """WITH e AS (
      | SELECT user_id, ts, event_id, CAST(round(value*100) AS BIGINT) AS vc,
      |   CASE WHEN lag(ts) OVER w IS NULL
      |          OR epoch_ns(ts) - epoch_ns(lag(ts) OVER w) > 1800000000000
      |        THEN 1 ELSE 0 END AS is_new
      | FROM events
      | WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
      |se AS (
      | SELECT user_id, ts, vc,
      |   SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |                     ROWS UNBOUNDED PRECEDING) AS sess_id
      | FROM e)
      |SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
      | CAST(epoch_ns(min(ts)) // 1000000000 AS BIGINT) AS session_start,
      | CAST(count(*) AS BIGINT) AS n_events,
      | CAST(sum(vc) AS BIGINT) AS sum_value_cents
      |FROM se GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  /** Tumbling 1-hour window counts/sums per event type (batch twin of
    * the streaming watermark+window aggregation). */
  def eventsTumbling(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events") // ts = nanos-since-epoch
    ev.groupBy(
        expr("(ts div 3600000000000) * 3600").as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(cents("value")).as("sum_value_cents"))
      .orderBy("hour_start", "event_type")
  }

  val eventsTumblingSql: String =
    """SELECT CAST((epoch_ns(ts) // 3600000000000) * 3600 AS BIGINT) AS hour_start,
      | event_type, CAST(count(*) AS BIGINT) AS n,
      | CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
      |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin

  /** TPC-H Q6-shaped forecast revenue: tight filter + single sum —
    * every predicate reaches the parquet scan (PushedFilters). */
  def q6Forecast(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    li.filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg((sum(cents("l_extendedprice") * cents("l_discount")).cast("double") / 10000.0)
        .as("revenue"))
  }

  val q6ForecastSql: String =
    """SELECT CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      |               * CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE)/10000.0 AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  /** TPC-H Q4-shaped: orders (in a window) having at least one late
    * lineitem — LEFT SEMI join, counted by priority. */
  def q4Semi(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey")
    ord.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q4SemiSql: String =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Customers with no orders since 2001 — LEFT ANTI join. */
  def qAntijoin(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      .select("o_custkey")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  val qAntijoinSql: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2001-01-01')
      |ORDER BY c_custkey""".stripMargin

  /** Revenue rollup over (returnflag, linestatus) — grouping sets. */
  def qRollup(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    li.rollup("l_returnflag", "l_linestatus")
      .agg(sum(cents("l_extendedprice")).as("rev_cents"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  val qRollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev_cents,
      | CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** CUBE — all four grouping sets of (returnflag, linestatus) in one
    * pass (rollup covers only the prefix chain): the full
    * cross-classification report a profiling pass emits, with an
    * explicit integer `grp` = GROUPING_ID distinguishing a NULL group
    * key from the NULL that means "aggregated over" — the table-stake
    * q_rollup's prefix hierarchy can't express. Spark plans cube as ONE
    * Expand + one aggregate (4× the map-side rows, map-side combined,
    * never 4 scans). */
  def qCube(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    li.cube("l_returnflag", "l_linestatus")
      .agg(grouping_id().as("grp"),
        sum(cents("l_extendedprice")).as("rev_cents"), count(lit(1)).as("n"))
      .orderBy(col("grp").asc,
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  val qCubeSql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS grp,
      | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev_cents,
      | CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY grp ASC, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** TPC-H Q17-shaped: lineitems below 50% of their part's average
    * quantity — per-part aggregate joined back (the DataFrame form of
    * a correlated scalar subquery). avg stays exact: comparison uses
    * 2·qty·cnt < sum (integer arithmetic), no double division. */
  def q17AvgSub(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity").cast("long")).as("qty_sum"),
        count(lit(1)).as("qty_cnt"))
    li.join(broadcast(perPart), col("l_partkey") === col("pk"))
      .filter(col("l_quantity").cast("long") * 2L * col("qty_cnt") < col("qty_sum"))
      .groupBy()
      .agg((sum(cents("l_extendedprice")).cast("double") / 100.0).as("total_price"),
        count(lit(1)).as("n_items"))
  }

  val q17AvgSubSql: String =
    """WITH pp AS (SELECT l_partkey AS pk,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
      |  CAST(count(*) AS BIGINT) AS qty_cnt
      | FROM lineitem GROUP BY 1)
      |SELECT CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS total_price,
      | CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem JOIN pp ON l_partkey = pk
      |WHERE CAST(l_quantity AS BIGINT) * 2 * qty_cnt < qty_sum""".stripMargin

  /** Exact distinct users + event counts per type (the exact twin of
    * the HLL approx_count_distinct path, spec'd in AnnSpec-adjacent
    * suites; at 100 TB you run the sketch, here both are verified). */
  def eventsDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
      .orderBy("event_type")

  val eventsDistinctSql: String =
    """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      | CAST(count(*) AS BIGINT) AS n_events
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** As-of join composed from built-ins (spark_guide preference (a)):
    * each error event matched to the most recent prior click of the
    * same user via an ignore-nulls running last over the event-time
    * order — no custom operator needed, no self-join. */
  def eventsAsof(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events") // ts = nanos (LongType)
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_click_ns",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("ts_us"), // µs: DuckDB reads nanos parquet at µs precision
        expr("last_click_ns div 1000").as("last_click_us"),
        // difference of the floored µs values (floor(a)−floor(b), to
        // match the oracle's epoch_us subtraction — not floor(a−b))
        expr("(ts div 1000) - (last_click_ns div 1000)").as("gap_us"))
      .orderBy("event_id")
  }

  val eventsAsofSql: String =
    """SELECT event_id, user_id, epoch_us(ts) AS ts_us, last_click_us,
      | epoch_us(ts) - last_click_us AS gap_us
      |FROM (SELECT *,
      |  last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |          ROWS UNBOUNDED PRECEDING) AS last_click_us
      | FROM events)
      |WHERE event_type = 'error' ORDER BY event_id""".stripMargin

  /** Signup → purchase conversion funnel per user (sequence detection:
    * first purchase strictly after first signup). */
  def eventsFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(expr("ts div 1000")).as("signup_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), expr("ts div 1000").as("pts"))
    signup.join(purchases, col("user_id") === col("pu") && col("pts") > col("signup_us"), "left")
      .groupBy("user_id", "signup_us")
      .agg(min(col("pts")).as("purchase_us"))
      .withColumn("converted", when(col("purchase_us").isNotNull, 1).otherwise(0))
      .orderBy("user_id")
  }

  val eventsFunnelSql: String =
    """WITH s AS (SELECT user_id, CAST(min(epoch_us(ts)) AS BIGINT) AS signup_us
      |           FROM events WHERE event_type = 'signup' GROUP BY 1)
      |SELECT s.user_id, s.signup_us,
      | CAST(min(CASE WHEN p.ts IS NOT NULL THEN epoch_us(p.ts) END) AS BIGINT) AS purchase_us,
      | CAST(CASE WHEN min(CASE WHEN p.ts IS NOT NULL THEN epoch_us(p.ts) END) IS NOT NULL
      |      THEN 1 ELSE 0 END AS INT) AS converted
      |FROM s LEFT JOIN events p
      |  ON p.user_id = s.user_id AND p.event_type = 'purchase' AND epoch_us(p.ts) > s.signup_us
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin

  /** Pivot-shaped: per user decile, event counts by type as columns
    * (manual conditional aggregation — the dialect-portable pivot). */
  def eventsPivot(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    def n(t: String) = sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t")
    ev.groupBy((col("user_id") % 10).as("user_mod"))
      .agg(n("click"), n("view"), n("purchase"), n("signup"), n("error"))
      .orderBy("user_mod")
  }

  val eventsPivotSql: String =
    """SELECT user_id % 10 AS user_mod,
      | CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
      | CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      | CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      | CAST(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
      | CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Brand-level part stats (covers the part table; exact cents). */
  def qPartStats(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.load(s, dir, "part")
    p.groupBy("p_brand")
      .agg(count(lit(1)).as("n_parts"),
        (sum(cents("p_retailprice")).cast("double") / 100.0).as("sum_retail"),
        max(col("p_size")).as("max_size"))
      .orderBy("p_brand")
  }

  val qPartStatsSql: String =
    """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
      | CAST(sum(CAST(round(p_retailprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_retail,
      | CAST(max(p_size) AS INT) AS max_size
      |FROM part GROUP BY 1 ORDER BY 1""".stripMargin

  /** Value histogram: fixed-width 50-unit bins over event values
    * (integer cents arithmetic → exact bin edges in both engines). */
  def eventsValueHist(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      // TRUNCATING division on both engines: DuckDB's integer `//`
      // truncates toward zero exactly like Spark's `div` (probed:
      // (-300)//5000 = 0, (-700)//500 = -1), so plain `div` IS the
      // twin arithmetic for any sign of cents — the same rule
      // events_drift's bucketing uses. (An earlier floor-emulation
      // here had the `//` semantics backwards and would have binned
      // negative cents differently from the oracle.)
      .groupBy(expr(
        "(cast(round(value*100) as bigint) div 5000) * 50")
        .as("bin_lo"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bin_lo")

  val eventsValueHistSql: String =
    """SELECT (CAST(round(value*100) AS BIGINT) // 5000) * 50 AS bin_lo,
      | CAST(count(*) AS BIGINT) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Top-10 suppliers by revenue (covers the supplier dimension with a
    * broadcast join; exact cents). */
  def qSupplierTop(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
    val sup = Tables.load(s, dir, "supplier")
    l.groupBy("l_suppkey")
      .agg(sum(cents("l_extendedprice")).as("rev_c"), count(lit(1)).as("n_items"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_c").cast("double") / 100.0).as("revenue"), col("n_items"))
      .orderBy(col("revenue").desc, col("s_suppkey"))
      .limit(10)
  }

  val qSupplierTopSql: String =
    """SELECT s_suppkey, s_name,
      | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS revenue,
      | CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY 1, 2 ORDER BY revenue DESC, s_suppkey LIMIT 10""".stripMargin

  /** Cohort retention: cohort = a user's first active day (integer day
    * from the nanosecond clock — exact), D1/D7 = distinct users active
    * exactly 1/7 days later. The standard training-corpus/product
    * analytics shape; all arithmetic integer-exact. */
  def eventsRetention(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
      .select(col("user_id"), expr("ts div 86400000000000").as("day"))
    val first = e.groupBy("user_id").agg(min(col("day")).as("cohort"))
    val act = e.distinct()
    first.join(act, "user_id")
      .groupBy("cohort")
      .agg(countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(col("day") === col("cohort") + 1, col("user_id"))).as("d1"),
        countDistinct(when(col("day") === col("cohort") + 7, col("user_id"))).as("d7"))
      .orderBy("cohort")
  }

  val eventsRetentionSql: String =
    """WITH e AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
      |f AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY 1),
      |a AS (SELECT DISTINCT user_id, day FROM e)
      |SELECT cohort, CAST(count(DISTINCT f.user_id) AS BIGINT) AS n_users,
      | CAST(count(DISTINCT CASE WHEN day = cohort + 1 THEN f.user_id END) AS BIGINT) AS d1,
      | CAST(count(DISTINCT CASE WHEN day = cohort + 7 THEN f.user_id END) AS BIGINT) AS d7
      |FROM f JOIN a ON f.user_id = a.user_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Per-user activity profile (count / distinct kinds / exact-cents
    * sum / first+last activity in raw nanos — never a timestamp type,
    * engines disagree on µs vs ns). */
  def eventsUserStats(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        (sum(cents("value")).cast("double") / 100.0).as("sum_value"),
        // µs, not raw nanos: DuckDB TIMESTAMP carries µs resolution
        expr("min(ts) div 1000").as("first_ts_us"),
        expr("max(ts) div 1000").as("last_ts_us"))
      .orderBy("user_id")

  val eventsUserStatsSql: String =
    """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      | CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
      | CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_value,
      | CAST(epoch_us(min(ts)) AS BIGINT) AS first_ts_us,
      | CAST(epoch_us(max(ts)) AS BIGINT) AS last_ts_us
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Order-to-ship delay histogram (date arithmetic; the shape of a
    * co-partitioned fact-fact join — orderkey is the natural bucket
    * key for both tables at scale). */
  def qShipDelayHist(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(s, dir, "lineitem")
    val o = Tables.load(s, dir, "orders")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")).as("delay_days"))
      .groupBy("delay_days").agg(count(lit(1)).as("n"))
      .orderBy("delay_days")
  }

  val qShipDelayHistSql: String =
    """SELECT CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) AS INT) AS delay_days,
      | CAST(count(*) AS BIGINT) AS n
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Semi-structured extraction: per event type, stats of the JSON
    * payload's `k` field (engine table-stakes — codegen'd JSON path
    * evaluation, no UDF). */
  def eventsPropsJson(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  val eventsPropsJsonSql: String =
    """SELECT event_type,
      | CAST(count(k) AS BIGINT) AS n_with_k,
      | CAST(sum(k) AS BIGINT) AS sum_k,
      | CAST(min(k) AS BIGINT) AS min_k,
      | CAST(max(k) AS BIGINT) AS max_k
      |FROM (SELECT event_type,
      |        CASE WHEN json_valid(props)
      |             THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS k
      |      FROM events)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Exact discrete quantiles of event value per type: the element at
    * 1-based index ceil(q·cnt) of the (cents, event_id)-sorted values —
    * pure integer index arithmetic, identical in both engines (approx
    * sketches like percentile_approx can never hash-match). */
  def eventsValueQuantiles(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
      .select(col("event_type"), cents("value").as("vc"), col("event_id"))
    val w = Window.partitionBy("event_type").orderBy(col("vc").asc, col("event_id").asc)
    val ranked = e.withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("event_type")))
    // integer ceil: (cnt*num + den - 1) div den
    def idx(num: Int, den: Int) = expr(s"(cnt * $num + ${den - 1}) div $den")
    ranked
      .groupBy("event_type")
      .agg(
        (sum(when(col("rn") === idx(1, 4), col("vc"))).cast("double") / 100.0).as("p25"),
        (sum(when(col("rn") === idx(2, 4), col("vc"))).cast("double") / 100.0).as("p50"),
        (sum(when(col("rn") === idx(3, 4), col("vc"))).cast("double") / 100.0).as("p75"),
        (sum(when(col("rn") === idx(19, 20), col("vc"))).cast("double") / 100.0).as("p95"),
        (sum(when(col("rn") === idx(99, 100), col("vc"))).cast("double") / 100.0).as("p99"))
      .orderBy("event_type")
  }

  val eventsValueQuantilesSql: String =
    """WITH e AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS vc, event_id
      |           FROM events),
      |r AS (SELECT event_type, vc,
      |        row_number() OVER (PARTITION BY event_type ORDER BY vc ASC, event_id ASC) AS rn,
      |        count(*) OVER (PARTITION BY event_type) AS cnt
      |      FROM e)
      |SELECT event_type,
      | CAST(sum(CASE WHEN rn = (cnt * 1 + 3) // 4 THEN vc END) AS DOUBLE)/100.0 AS p25,
      | CAST(sum(CASE WHEN rn = (cnt * 2 + 3) // 4 THEN vc END) AS DOUBLE)/100.0 AS p50,
      | CAST(sum(CASE WHEN rn = (cnt * 3 + 3) // 4 THEN vc END) AS DOUBLE)/100.0 AS p75,
      | CAST(sum(CASE WHEN rn = (cnt * 19 + 19) // 20 THEN vc END) AS DOUBLE)/100.0 AS p95,
      | CAST(sum(CASE WHEN rn = (cnt * 99 + 99) // 100 THEN vc END) AS DOUBLE)/100.0 AS p99
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  /** Sliding (hopping) 1-hour windows on a 15-minute hop: each event
    * lands in the 4 windows covering it — window starts derived with
    * exact integer ns arithmetic (floor to hop, back off 3 hops, keep
    * starts ≤ ts < start+window). The hopping-aggregation staple that
    * tumbling windows don't cover. */
  def eventsSliding(s: SparkSession, dir: String): DataFrame = {
    val hopNs = 900000000000L       // 15 min
    val winNs = 3600000000000L      // 1 h
    Tables.load(s, dir, "events")
      .select(col("event_type"), col("ts"),
        expr(s"(ts - pmod(ts, $hopNs)) div $hopNs").as("hop_idx"))
      .select(col("event_type"), col("ts"),
        explode(expr("sequence(hop_idx - 3, hop_idx)")).as("win_hop"))
      .filter(col("win_hop") >= 0 &&
        expr(s"win_hop * $hopNs + $winNs") > col("ts"))
      .groupBy(expr(s"win_hop * 900").as("win_start_s"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("win_start_s", "event_type")
  }

  val eventsSlidingSql: String =
    """SELECT win_hop * 900 AS win_start_s, event_type, CAST(count(*) AS BIGINT) AS n
      |FROM (
      |  SELECT event_type, ts, unnest(range(h - 3, h + 1)) AS win_hop
      |  FROM (SELECT event_type, epoch_ns(ts) AS ts,
      |          epoch_ns(ts) // 900000000000 AS h FROM events))
      |WHERE win_hop >= 0 AND win_hop * 900000000000 + 3600000000000 > ts
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** INTERVAL (banded range) JOIN — click → purchase attribution: every
    * (click, purchase) pair of the same user with the purchase inside
    * the 6-hour window after the click. The naive form is a non-equi
    * theta join (per-user quadratic under a sort-merge on user alone);
    * this plans it as an EQUI-join via bucket blocking: bucket width ==
    * band width, the click side replicates to buckets (b, b+1) and a
    * purchase carries its single bucket, so a qualifying pair collides
    * in exactly one (user, bucket) key and the shuffle is 2·|clicks| +
    * |purchases| rows — never a per-user cross product. At 100 TB both
    * sides hash-exchange on the composite key and AQE handles a hot
    * bucket like any other skewed equi-join (salting composes, the
    * q_skew_join pattern). Timestamp arithmetic is integer µs end to
    * end (the events_asof discipline), band inclusive on both edges. */
  val IntervalUs = 6L * 3600L * 1000000L // 6-hour attribution band

  def eventsIntervalJoin(s: SparkSession, dir: String): DataFrame =
    intervalPairs(Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("ts div 1000").as("ts_us")), IntervalUs)
      .orderBy("click_id", "purchase_id")

  /** The bucket-blocked core over any (event_id, user_id, event_type,
    * ts_us) frame — injectable for the spec's planted-edge cases. */
  private[graft] def intervalPairs(ev: DataFrame, bandUs: Long): DataFrame = {
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts_us").as("c_us"),
        explode(expr(s"array(ts_us div $bandUs, ts_us div $bandUs + 1)")).as("bucket"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_us").as("p_us"), expr(s"ts_us div $bandUs").as("bucket"))
    clicks.join(purchases, Seq("user_id", "bucket"))
      .filter(col("p_us") >= col("c_us") &&
        col("p_us") - col("c_us") <= bandUs)
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        (col("p_us") - col("c_us")).as("gap_us"))
  }

  val eventsIntervalJoinSql: String =
    s"""SELECT c.event_id AS click_id, p.event_id AS purchase_id,
       | c.user_id, epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
       |FROM events c JOIN events p ON p.user_id = c.user_id
       | AND c.event_type = 'click' AND p.event_type = 'purchase'
       | AND epoch_us(p.ts) >= epoch_us(c.ts)
       | AND epoch_us(p.ts) - epoch_us(c.ts) <= $IntervalUs
       |ORDER BY click_id, purchase_id""".stripMargin

  /** Integer-exact 3σ outlier flagging per event_type — the profiling
    * pass a curation pipeline runs to quarantine anomalous rows before
    * training. The test (v − μ)² > 9σ² is evaluated WITHOUT ever
    * forming μ or σ: multiplying through by n² gives
    * (n·vc − S)² > 9·(n·Q − S²) over the per-group count/sum/sum-of-
    * squares (vc = value in cents), all products DECIMAL(38,0)-widened
    * so nothing wraps at any corpus size — a pure integer inequality
    * both engines evaluate identically, no IEEE division anywhere.
    * Scale shape: one map-side-combined aggregate (3 longs per group),
    * broadcast back, flagging is a codegen filter inside the scan. */
  def eventsOutliers(s: SparkSession, dir: String): DataFrame =
    outliersCore(Tables.load(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("vc")))

  /** The broadcast-stats core over any (event_id, event_type, vc)
    * frame — injectable for the spec's planted distributions. */
  private[graft] def outliersCore(e: DataFrame): DataFrame = {
    // widen BEFORE aggregating: Σvc and Σvc² summed as LONG wrap at
    // ~1e11 rows of ~5e4-cent values (Σvc² ≈ 2.4e20 > Long.Max) and a
    // wrapped q makes the variance negative, flagging everything.
    // DECIMAL(38,0) sums stay exact to ~1e14 rows — and the twin
    // aggregates in HUGEINT, so both engines carry exact integers.
    val st = e.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("vc").cast("decimal(38,0)")).as("s"),
      sum(expr("cast(vc as decimal(38,0)) * vc")).as("q"))
    e.join(broadcast(st), "event_type")
      .withColumn("d", expr("cast(n as decimal(38,0)) * vc - s"))
      .filter(expr(
        "d * d > 9 * (cast(n as decimal(38,0)) * q - cast(s as decimal(38,0)) * s)"))
      .select(col("event_id"), col("event_type"), col("vc"),
        when(expr("d > 0"), 1).otherwise(0).as("is_high"))
      .orderBy("event_id")
  }

  val eventsOutliersSql: String =
    """WITH e AS (SELECT event_id, event_type,
      |             CAST(round(value*100) AS BIGINT) AS vc FROM events),
      |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |         sum(vc::HUGEINT) AS s, sum(vc::HUGEINT * vc) AS q
      |       FROM e GROUP BY 1)
      |SELECT event_id, e.event_type, vc,
      |  CAST(CASE WHEN n::HUGEINT * vc > s::HUGEINT THEN 1 ELSE 0 END AS INT) AS is_high
      |FROM e JOIN st ON st.event_type = e.event_type
      |WHERE (n::HUGEINT * vc - s) * (n::HUGEINT * vc - s)
      |      > 9 * (n::HUGEINT * q - s::HUGEINT * s)
      |ORDER BY event_id""".stripMargin

  /** Time-series GAP FILLING — densify the hourly count series so every
    * (event_type, hour) in the corpus span is present, zeros included:
    * the densification every downstream time-series consumer (charting,
    * anomaly windows, forecasting joins) needs, and one a plain GROUP
    * BY cannot produce (absent hours simply vanish). The dense grid is
    * DIMENSION-bounded (types × hours), never corpus-bounded — the
    * corpus-sized stage stays one map-side-combined count; the grid
    * generates from the global [min, max] hour via one broadcast-able
    * 2-row aggregate and a sequence explode, then left-joins the
    * counts. Integer-ns hour bucketing end to end. */
  def eventsGapfill(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("event_type"), expr("ts div 3600000000000").as("h"))
    val counts = ev.groupBy("event_type", "h").agg(count(lit(1)).as("n"))
    val span = ev.agg(min("h").as("h0"), max("h").as("h1"))
    val grid = ev.select("event_type").distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("h"))
    grid.join(counts, Seq("event_type", "h"), "left")
      .select(col("event_type"), expr("h * 3600").as("hour_start_s"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("event_type", "hour_start_s")
  }

  val eventsGapfillSql: String =
    """WITH e AS (SELECT event_type, epoch_ns(ts) // 3600000000000 AS h FROM events),
      |c AS (SELECT event_type, h, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1, 2),
      |sp AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
      |grid AS (SELECT event_type, unnest(range(h0, h1 + 1)) AS h
      |         FROM (SELECT DISTINCT event_type FROM e) CROSS JOIN sp)
      |SELECT grid.event_type, grid.h * 3600 AS hour_start_s,
      |  COALESCE(c.n, 0) AS n
      |FROM grid LEFT JOIN c ON c.event_type = grid.event_type AND c.h = grid.h
      |ORDER BY 1, 2""".stripMargin

  /** ROBUST (median/MAD) outlier flagging — the resistant sibling of
    * events_outliers: a single extreme inflates the mean AND the σ it
    * is tested against (masking), while the median and the median
    * absolute deviation ignore any minority of wild values. Flag iff
    * |vc − median| > 3·MAD — every quantity a LONG (the median and MAD
    * land on actual data values via the events_value_quantiles
    * 1-based ceil(n/2) index over a (value, id)-deterministic sort),
    * so the test is a pure integer comparison, no scaling, no IEEE
    * anything. Two per-group sorted passes (values, then deviations) —
    * the exact profiling form; at 100 TB the sampled-quantile sketch
    * bounds the same medians at p·n cost. */
  def eventsAnomalyMad(s: SparkSession, dir: String): DataFrame =
    madCore(Tables.load(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("vc")))

  /** The median/MAD core over any (event_id, event_type, vc) frame —
    * injectable for the spec's planted masking scenario. */
  private[graft] def madCore(e: DataFrame): DataFrame = {
    def medianOf(in: DataFrame, valueCol: String, out: String): DataFrame = {
      val w = Window.partitionBy("event_type")
        .orderBy(col(valueCol).asc, col("event_id").asc)
      in.withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy("event_type")))
        .groupBy("event_type")
        .agg(sum(when(col("rn") === expr("(cnt + 1) div 2"), col(valueCol))).as(out))
    }
    val med = medianOf(e, "vc", "med")
    val dev = e.join(broadcast(med), "event_type")
      .withColumn("dv", abs(col("vc") - col("med")))
    val mad = medianOf(dev, "dv", "mad")
    dev.join(broadcast(mad), "event_type")
      .filter(col("dv") > expr("3 * mad"))
      .select(col("event_id"), col("event_type"), col("vc"),
        col("med"), col("mad"))
      .orderBy("event_id")
  }

  val eventsAnomalyMadSql: String =
    """WITH e AS (SELECT event_id, event_type,
      |             CAST(round(value*100) AS BIGINT) AS vc FROM events),
      |rv AS (SELECT event_type, vc,
      |         row_number() OVER (PARTITION BY event_type
      |           ORDER BY vc ASC, event_id ASC) AS rn,
      |         count(*) OVER (PARTITION BY event_type) AS cnt FROM e),
      |med AS (SELECT event_type,
      |          CAST(sum(CASE WHEN rn = (cnt + 1) // 2 THEN vc END) AS BIGINT) AS med
      |        FROM rv GROUP BY 1),
      |dv AS (SELECT e.event_id, e.event_type, e.vc, med.med,
      |         abs(e.vc - med.med) AS dv
      |       FROM e JOIN med ON med.event_type = e.event_type),
      |rd AS (SELECT event_type, dv,
      |         row_number() OVER (PARTITION BY event_type
      |           ORDER BY dv ASC, event_id ASC) AS rn,
      |         count(*) OVER (PARTITION BY event_type) AS cnt FROM dv),
      |mad AS (SELECT event_type,
      |          CAST(sum(CASE WHEN rn = (cnt + 1) // 2 THEN dv END) AS BIGINT) AS mad
      |        FROM rd GROUP BY 1)
      |SELECT dv.event_id, dv.event_type, dv.vc, dv.med, mad.mad
      |FROM dv JOIN mad ON mad.event_type = dv.event_type
      |WHERE dv.dv > 3 * mad.mad
      |ORDER BY event_id""".stripMargin

  /** TPC-H Q13-shaped customer order-count DISTRIBUTION: how many
    * customers placed exactly k (non-urgent) orders, zero included —
    * the outer-join double-aggregation shape (a LEFT join whose
    * unmatched side must survive into the first GROUP BY, then a
    * second aggregation over the grouped counts). Scale: the first
    * aggregate is keyed by customer (hash exchange on the natural key,
    * map-side combinable); the second input is at most
    * |distinct counts| rows. Output integer-exact end to end. */
  def q13Custdist(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer").select("c_custkey")
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_orderkey", "o_custkey")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count").agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13CustdistSql: String =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
      |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q18-shaped large-volume orders: orders whose total lineitem
    * quantity clears a threshold, joined back to customer — the
    * aggregate-HAVING-then-semi-join shape. The qty aggregate is the
    * only fact-sized stage (map-side combinable, keyed on the natural
    * join key so the join back to orders reuses the exchange);
    * customer is broadcast. Money leaves as exact cents. */
  val BigOrderQty = 250L
  def q18BigOrders(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.load(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
      .filter(col("sum_qty") > BigOrderQty)
    val ord = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        cents("o_totalprice").as("totalprice_cents"))
    val cust = Tables.load(s, dir, "customer").select("c_custkey", "c_name")
    ord.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
        "totalprice_cents", "sum_qty")
      .orderBy(col("totalprice_cents").desc, col("o_orderkey").asc)
  }

  val q18BigOrdersSql: String =
    s"""SELECT c_name, c_custkey, o_orderkey,
       |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       |  CAST(round(o_totalprice*100) AS BIGINT) AS totalprice_cents, sum_qty
       |FROM orders
       |JOIN (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
       |      FROM lineitem GROUP BY 1 HAVING sum(CAST(l_quantity AS BIGINT)) > $BigOrderQty) b
       |  ON o_orderkey = b.l_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY totalprice_cents DESC, o_orderkey ASC""".stripMargin

  /** TPC-H Q19-shaped DISJUNCTIVE-predicate join: revenue over
    * lineitem⋈part where three OR'd (brand, size-band, qty-band)
    * branches qualify — the shape that tests OR-predicate planning
    * (one equi-join on the part key with the disjunction evaluated as
    * a post-join codegen filter; part broadcasts). The empty-match
    * case returns an explicit 0 row on both engines. */
  def q19Disjunctive(s: SparkSession, dir: String): DataFrame = {
    val pt = Tables.load(s, dir, "part").select("p_partkey", "p_brand", "p_size")
    val li = Tables.load(s, dir, "lineitem").select(col("l_partkey"), col("l_quantity"),
      (cents("l_extendedprice") * (lit(100L) - cents("l_discount"))).as("rev"))
    val qualify =
      (col("p_brand") === "Brand#11" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#22" && col("p_size").between(1, 25) &&
        col("l_quantity").between(10, 35)) ||
      (col("p_brand") === "Brand#33" && col("p_size").between(1, 35) &&
        col("l_quantity").between(20, 50))
    li.join(broadcast(pt), col("l_partkey") === col("p_partkey") && qualify)
      .agg((coalesce(sum(col("rev")), lit(0L)).cast("double") / 10000.0).as("revenue"))
  }

  val q19DisjunctiveSql: String =
    """SELECT CAST(COALESCE(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      |    * (100 - CAST(round(l_discount*100) AS BIGINT))), 0) AS DOUBLE)/10000.0 AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 35)
      |   OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 50)""".stripMargin

  /** TPC-H Q21-shaped "sole-problem supplier" count: per supplier, the
    * finished-order 'R' lineitems where ANOTHER supplier was also on
    * the order (correlated EXISTS → left-semi) but NO other supplier
    * had an 'R' item on it (correlated NOT EXISTS → left-anti) — the
    * double-correlated-subquery shape, planned as two self-joins of
    * the fact table on its natural key (both shuffle on l_orderkey and
    * AQE/salting compose; the reference Q21 correlates on
    * receipt-vs-commit dates, which this schema does not carry — the
    * returnflag stands in, same plan shape). Top-20 by count. */
  def q21Waiting(s: SparkSession, dir: String): DataFrame =
    q21Core(
      Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_returnflag"),
      Tables.load(s, dir, "orders").select("o_orderkey", "o_orderstatus"),
      Tables.load(s, dir, "supplier").select("s_suppkey", "s_name"))

  /** The Q21 core over any (l_orderkey, l_suppkey, l_returnflag) /
    * (o_orderkey, o_orderstatus) / (s_suppkey, s_name) frames —
    * injectable for the spec's planted multi-supplier orders. */
  private[graft] def q21Core(liRaw: DataFrame, ord: DataFrame,
                             supp: DataFrame): DataFrame = {
    val li = liRaw.select("l_orderkey", "l_suppkey")
    val l1 = liRaw.filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_suppkey")
    val ordF = ord.filter(col("o_orderstatus") === "F").select("o_orderkey")
    val base = l1.join(ordF, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_suppkey")
    val withOther = base.alias("a").join(li.alias("b"),
      col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_suppkey") =!= col("b.l_suppkey"), "left_semi")
    val soleProblem = withOther.alias("a").join(l1.alias("c"),
      col("a.l_orderkey") === col("c.l_orderkey") &&
        col("a.l_suppkey") =!= col("c.l_suppkey"), "left_anti")
    soleProblem.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(20)
  }

  val q21WaitingSql: String =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM lineitem l1
      |JOIN supplier ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY 1 ORDER BY numwait DESC, s_name ASC LIMIT 20""".stripMargin

  /** TPC-H Q22-shaped global-customer analysis: customers whose
    * balance clears the GLOBAL positive-balance average (a scalar
    * aggregate subquery — broadcast as one row, compared by exact
    * integer cross-multiplication cb·n > Σcb so the float average is
    * never formed) and who placed no URGENT order (anti join on a
    * filtered fact side), grouped by a derived country code. The
    * reference Q22 codes on a phone prefix this schema doesn't carry;
    * custkey mod 7 stands in — same scalar-subquery + NOT EXISTS +
    * group shape. Money leaves as exact cents. */
  def q22Global(s: SparkSession, dir: String): DataFrame =
    q22Core(
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"), cents("c_acctbal").as("cb")),
      Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey"))

  /** The Q22 core over any (c_custkey, cb-cents) / (o_custkey) frames
    * — injectable for the spec's at-the-average boundary pins. */
  private[graft] def q22Core(c: DataFrame, urgent: DataFrame): DataFrame = {
    val pos = c.filter(col("cb") > 0)
      .agg(sum("cb").as("spos"), count(lit(1)).as("npos"))
    c.crossJoin(broadcast(pos))
      .filter(col("cb") * col("npos") > col("spos"))
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .withColumn("cntrycode", col("c_custkey") % 7)
      .groupBy("cntrycode")
      .agg(count(lit(1)).as("numcust"),
        (sum("cb").cast("double") / 100.0).as("totacctbal"))
      .orderBy("cntrycode")
  }

  val q22GlobalSql: String =
    """WITH c AS (SELECT c_custkey, CAST(round(c_acctbal*100) AS BIGINT) AS cb FROM customer),
      |pos AS (SELECT CAST(sum(cb) AS BIGINT) AS spos, CAST(count(*) AS BIGINT) AS npos
      |        FROM c WHERE cb > 0)
      |SELECT c_custkey % 7 AS cntrycode, CAST(count(*) AS BIGINT) AS numcust,
      |  CAST(sum(cb) AS DOUBLE)/100.0 AS totacctbal
      |FROM c CROSS JOIN pos
      |WHERE cb * npos > spos
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** TPC-H Q7-shaped VOLUME SHIPPING: revenue flowing between two
    * nations in both directions by order year — the two-dimension
    * dimension-pair aggregation (supplier nation × customer nation),
    * with all four dims broadcast and the fact-fact join on the
    * natural key. Exact cents. */
  def q7NationVolume(s: SparkSession, dir: String): DataFrame = {
    val nat = Tables.load(s, dir, "nation").select("n_nationkey", "n_name")
    val supp = Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("o_year"))
    val li = Tables.load(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"),
      (cents("l_extendedprice") * (lit(100L) - cents("l_discount"))).as("rev"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_8") ||
        (col("supp_nation") === "NATION_8" && col("cust_nation") === "NATION_3"))
      .groupBy("supp_nation", "cust_nation", "o_year")
      .agg((sum(col("rev")).cast("double") / 10000.0).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "o_year")
  }

  val q7NationVolumeSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(o_orderdate) AS INT) AS o_year,
      |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      |    * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
      |   OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** TPC-H Q8-shaped MARKET SHARE: per order year, one nation's share
    * of the revenue sold into a region — numerator and denominator as
    * exact cents off ONE aggregation pass (a conditional sum, no
    * second scan), the share itself a single IEEE division of the two
    * exact longs. */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val nat = Tables.load(s, dir, "nation")
    val reg = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
    val custAsia = Tables.load(s, dir, "customer").select("c_custkey", "c_nationkey")
      .join(broadcast(nat.select("n_nationkey", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey")
    val supp = Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      .join(broadcast(nat.select(col("n_nationkey").as("sn_key"), col("n_name"))),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val ord = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("o_year"))
    val li = Tables.load(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"),
      (cents("l_extendedprice") * (lit(100L) - cents("l_discount"))).as("rev"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(custAsia, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy("o_year")
      .agg(sum(when(col("supp_nation") === "NATION_12", col("rev"))
          .otherwise(0L)).as("num_cents"),
        sum(col("rev")).as("denom_cents"))
      .withColumn("mkt_share",
        col("num_cents").cast("double") / col("denom_cents").cast("double"))
      .orderBy("o_year")
  }

  val q8MarketShareSql: String =
    """WITH base AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS o_year, sn.n_name AS supp_nation,
      |    CAST(round(l_extendedprice*100) AS BIGINT)
      |      * (100 - CAST(round(l_discount*100) AS BIGINT)) AS rev
      |  FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  WHERE EXISTS (SELECT 1 FROM customer
      |                JOIN nation cn ON c_nationkey = cn.n_nationkey
      |                JOIN region ON cn.n_regionkey = r_regionkey
      |                WHERE c_custkey = o_custkey AND r_name = 'ASIA'))
      |SELECT o_year,
      |  CAST(sum(CASE WHEN supp_nation = 'NATION_12' THEN rev ELSE 0 END) AS BIGINT) AS num_cents,
      |  CAST(sum(rev) AS BIGINT) AS denom_cents,
      |  CAST(sum(CASE WHEN supp_nation = 'NATION_12' THEN rev ELSE 0 END) AS DOUBLE)
      |    / CAST(sum(rev) AS DOUBLE) AS mkt_share
      |FROM base GROUP BY 1 ORDER BY 1""".stripMargin

  /** Value DECILES per event type: ntile(10) over the deterministic
    * (value cents, event_id) order — the equi-depth histogram profile
    * (bucket sizes differ by at most one; both engines implement the
    * standard balanced-bucket rule over the same unique order, so the
    * per-bucket counts and exact cent boundaries grade bit-exactly).
    * Output is |types|·10 rows at any corpus size. */
  def eventsNtile(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("vc"))
    val w = Window.partitionBy("event_type").orderBy(col("vc").asc, col("event_id").asc)
    e.withColumn("decile", ntile(10).over(w))
      .groupBy("event_type", "decile")
      .agg(count(lit(1)).as("n"), min("vc").as("min_vc"), max("vc").as("max_vc"))
      .orderBy("event_type", "decile")
  }

  val eventsNtileSql: String =
    """WITH e AS (SELECT event_id, event_type,
      |             CAST(round(value*100) AS BIGINT) AS vc FROM events),
      |d AS (SELECT event_type, vc,
      |        ntile(10) OVER (PARTITION BY event_type
      |          ORDER BY vc ASC, event_id ASC) AS decile FROM e)
      |SELECT event_type, CAST(decile AS INT) AS decile,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(min(vc) AS BIGINT) AS min_vc, CAST(max(vc) AS BIGINT) AS max_vc
      |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Event-type TRIGRAM mining — the sequential-pattern table (the
    * n-gram sweep of user journeys: which 3-step behavior paths are
    * common): per user the events order by (ts, event_id) — one
    * window pass keyed by user_id, no global sort — consecutive
    * type triples count corpus-wide (wordcount-shaped, map-side
    * combinable) and the top-10 cut runs as TakeOrdered. Integer
    * counts; the unique order (n DESC, t1, t2, t3) pins the limit. */
  def eventsTypeTrigrams(s: SparkSession, dir: String): DataFrame =
    trigramsCore(Tables.load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type")))

  private[graft] def trigramsCore(e: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    e.select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("t1"))
      .withColumn("t2", lead("t1", 1).over(w))
      .withColumn("t3", lead("t1", 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy("t1", "t2", "t3").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(10)
  }

  val eventsTypeTrigramsSql: String =
    """WITH s AS (SELECT user_id, event_type AS t1,
      |  lead(event_type)    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2,
      |  lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t3
      |FROM events)
      |SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
      |FROM s WHERE t3 IS NOT NULL
      |GROUP BY 1, 2, 3 ORDER BY n DESC, t1, t2, t3 LIMIT 10""".stripMargin

  /** Event-type TRANSITION MATRIX — the first-order Markov model of
    * user journeys (the bigram sibling of events_type_trigrams, with
    * row-normalized transition probabilities): consecutive type pairs
    * per user off one (ts, id)-ordered window pass, counted
    * corpus-wide, each row's probability the exact rational
    * (n·10⁶) div row_total — the table a session-simulation or
    * next-event-prediction baseline trains from. Dimension-bounded
    * output (|types|² rows max). */
  def eventsMarkov(s: SparkSession, dir: String): DataFrame =
    markovCore(Tables.load(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type")))

  private[graft] def markovCore(e: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val pairs = e.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("t1"))
      .withColumn("t2", lead("t1", 1).over(w))
      .filter(col("t2").isNotNull)
      .groupBy("t1", "t2").agg(count(lit(1)).as("n"))
    val tot = pairs.groupBy("t1").agg(sum("n").as("row_total"))
    pairs.join(broadcast(tot), "t1")
      .withColumn("p_ppm", expr("(n * 1000000) div row_total"))
      .select("t1", "t2", "n", "row_total", "p_ppm")
      .orderBy("t1", "t2")
  }

  val eventsMarkovSql: String =
    """WITH s AS (SELECT user_id, event_type AS t1,
      |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t2
      |FROM events),
      |c AS (SELECT t1, t2, CAST(count(*) AS BIGINT) AS n
      |      FROM s WHERE t2 IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT t1, CAST(sum(n) AS BIGINT) AS row_total FROM c GROUP BY 1)
      |SELECT c.t1, c.t2, c.n, t.row_total,
      |  (c.n * 1000000) // t.row_total AS p_ppm
      |FROM c JOIN t ON t.t1 = c.t1
      |ORDER BY 1, 2""".stripMargin

  /** MARKET-BASKET brand pairs — association mining over orders
    * (Agrawal & Srikant '94 support/confidence, plus lift): the
    * distinct (order, brand) set joins itself within the order key
    * (pair work bounded by basket size, never a corpus cross; a
    * pathological mega-basket salts like any hot join key), support =
    * co-occurring orders, confidence and lift as exact ppm rationals
    * off the per-brand order counts and the basket total — all
    * integers (DECIMAL-widened lift product), top-20 by
    * (support DESC, brand_a, brand_b). */
  def qBasketPairs(s: SparkSession, dir: String): DataFrame = {
    val pt = Tables.load(s, dir, "part").select("p_partkey", "p_brand")
    // ONE exchange by the basket key feeds everything downstream: the
    // (order, brand) distinct clusters by a superset of the partition
    // key, the basket self-join joins on it, and the distinct-order
    // count groups by it — so the cached table's HashPartitioning
    // (l_orderkey) satisfies all three and the plan keeps a single
    // Exchange where distinct + both join sides + the count each paid
    // their own (guide §2.4: operations keyed the same way share one
    // exchange). This is also what un-anti-scales the pair explosion:
    // it now runs in place on the cached partitions, map-side-partial
    // into a 300-group shuffle.
    val b = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_partkey")
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand"))
      .repartition(col("l_orderkey"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val cBrand = b.groupBy("p_brand").agg(count(lit(1)).as("c1"))
    val nOrders = b.select("l_orderkey").distinct().count()
    val pairs = b.alias("x").join(b.alias("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.p_brand") < col("y.p_brand"))
      .select(col("x.p_brand").as("brand_a"), col("y.p_brand").as("brand_b"))
      .groupBy("brand_a", "brand_b").agg(count(lit(1)).as("support"))
    val out = pairs
      .join(broadcast(cBrand.select(col("p_brand").as("brand_a"), col("c1").as("ca"))), "brand_a")
      .join(broadcast(cBrand.select(col("p_brand").as("brand_b"), col("c1").as("cb"))), "brand_b")
      .select(col("brand_a"), col("brand_b"), col("support"), col("ca"), col("cb"),
        expr("(support * 1000000) div ca").as("conf_ab_ppm"),
        expr("(support * 1000000) div cb").as("conf_ba_ppm"),
        expr(s"cast(cast(support as decimal(38,0)) * $nOrders * 1000000" +
          s" div (cast(ca as decimal(38,0)) * cb) as long)").as("lift_ppm"))
      .orderBy(col("support").desc, col("brand_a"), col("brand_b"))
      .limit(20)
    // detach the 20-row result so the basket cache releases instead of
    // pinning the distinct (order, brand) set for the session lifetime
    graft.Mat.detach(out)
    } finally b.unpersist(blocking = false)
  }

  val qBasketPairsSql: String =
    """WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey, p_brand
      |      FROM lineitem JOIN part ON l_partkey = p_partkey),
      |c1 AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1),
      |nn AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM b),
      |p AS (SELECT x.p_brand AS brand_a, y.p_brand AS brand_b,
      |        CAST(count(*) AS BIGINT) AS support
      |      FROM b x JOIN b y ON x.l_orderkey = y.l_orderkey
      |        AND x.p_brand < y.p_brand
      |      GROUP BY 1, 2)
      |SELECT brand_a, brand_b, support, ca.c AS ca, cb.c AS cb,
      |  (support * 1000000) // ca.c AS conf_ab_ppm,
      |  (support * 1000000) // cb.c AS conf_ba_ppm,
      |  CAST((support::HUGEINT * nn.n * 1000000) // (ca.c::HUGEINT * cb.c) AS BIGINT) AS lift_ppm
      |FROM p JOIN c1 ca ON ca.p_brand = brand_a
      |JOIN c1 cb ON cb.p_brand = brand_b CROSS JOIN nn
      |ORDER BY support DESC, brand_a, brand_b LIMIT 20""".stripMargin

  /** DISTRIBUTION DRIFT between two time windows — the data-quality
    * monitor a production ingest runs (did the value distribution
    * move?): the corpus splits at the midpoint of the global ts range
    * (one 2-long aggregate broadcast back — a map-only split, no
    * global sort), per (event_type, fixed-width value bucket) counts
    * full-outer join across the halves, and the drift per type is the
    * exact TOTAL-VARIATION distance in ppm — Σ|na·NB − nb·NA| over
    * buckets, scaled by 10⁶ div (2·NA·NB), every product
    * DECIMAL-widened so nothing wraps at any corpus size. TV is the
    * bounded [0, 1e6] metric PSI's log can't grade exactly; both
    * engines reproduce every cell digit-for-digit. */
  val DriftBucketCents = 500L
  def eventsDrift(s: SparkSession, dir: String): DataFrame =
    driftCore(Tables.load(s, dir, "events")
      .select(col("event_type"), col("ts"),
        round(col("value") * 100).cast("long").as("vc")))

  /** The TV-drift core over any (event_type, ts, vc) frame —
    * injectable for the spec's identical/disjoint halves. */
  private[graft] def driftCore(e: DataFrame): DataFrame = {
    val span = e.agg(min("ts").as("lo"), max("ts").as("hi"))
    val tagged = e.crossJoin(broadcast(span))
      .withColumn("win", when(col("ts") <= expr("lo + (hi - lo) div 2"), "a")
        .otherwise("b"))
      .withColumn("bucket", expr(s"vc div $DriftBucketCents"))
    val cnt = tagged.groupBy("event_type", "win", "bucket")
      .agg(count(lit(1)).as("n"))
    val a = cnt.filter(col("win") === "a")
      .select(col("event_type"), col("bucket"), col("n").as("na"))
    val bb = cnt.filter(col("win") === "b")
      .select(col("event_type"), col("bucket"), col("n").as("nb"))
    val joined = a.join(bb, Seq("event_type", "bucket"), "full_outer")
      .select(col("event_type"), col("bucket"),
        coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    val tot = joined.groupBy("event_type")
      .agg(sum("na").as("tot_a"), sum("nb").as("tot_b"))
    joined.join(broadcast(tot), "event_type")
      .filter(col("tot_a") > 0 && col("tot_b") > 0)
      .withColumn("dev",
        expr("abs(cast(na as decimal(38,0)) * tot_b - cast(nb as decimal(38,0)) * tot_a)"))
      .groupBy("event_type", "tot_a", "tot_b")
      .agg(count(lit(1)).as("n_buckets"),
        expr("cast(sum(dev) * 1000000 div (2 * cast(max(tot_a) as decimal(38,0)) * max(tot_b)) as long)")
          .as("tv_ppm"))
      .select("event_type", "tot_a", "tot_b", "n_buckets", "tv_ppm")
      .orderBy("event_type")
  }

  val eventsDriftSql: String =
    s"""WITH e AS (SELECT event_type, epoch_ns(ts) AS tsn,
       |             CAST(round(value*100) AS BIGINT) AS vc FROM events),
       |sp AS (SELECT min(tsn) AS lo, max(tsn) AS hi FROM e),
       |tg AS (SELECT event_type,
       |         CASE WHEN tsn <= lo + (hi - lo) // 2 THEN 'a' ELSE 'b' END AS win,
       |         vc // $DriftBucketCents AS bucket
       |       FROM e CROSS JOIN sp),
       |c AS (SELECT event_type, win, bucket, CAST(count(*) AS BIGINT) AS n
       |      FROM tg GROUP BY 1, 2, 3),
       |j AS (SELECT COALESCE(x.event_type, y.event_type) AS event_type,
       |        COALESCE(x.bucket, y.bucket) AS bucket,
       |        COALESCE(x.n, 0) AS na, COALESCE(y.n, 0) AS nb
       |      FROM (SELECT * FROM c WHERE win = 'a') x
       |      FULL OUTER JOIN (SELECT * FROM c WHERE win = 'b') y
       |        ON x.event_type = y.event_type AND x.bucket = y.bucket),
       |t AS (SELECT event_type, CAST(sum(na) AS BIGINT) AS tot_a,
       |        CAST(sum(nb) AS BIGINT) AS tot_b FROM j GROUP BY 1)
       |SELECT j.event_type, t.tot_a, t.tot_b,
       |  CAST(count(*) AS BIGINT) AS n_buckets,
       |  CAST(sum(abs(j.na::HUGEINT * t.tot_b - j.nb::HUGEINT * t.tot_a)) * 1000000
       |    // (2 * t.tot_a::HUGEINT * t.tot_b) AS BIGINT) AS tv_ppm
       |FROM j JOIN t ON t.event_type = j.event_type
       |WHERE t.tot_a > 0 AND t.tot_b > 0
       |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_type_trigrams" -> (eventsTypeTrigrams _),
    "events_markov" -> (eventsMarkov _),
    "q_basket_pairs" -> (qBasketPairs _),
    "events_drift" -> (eventsDrift _),
    "q7_nation_volume" -> (q7NationVolume _),
    "q8_market_share" -> (q8MarketShare _),
    "events_ntile" -> (eventsNtile _),
    "q13_custdist" -> (q13Custdist _),
    "q18_big_orders" -> (q18BigOrders _),
    "q19_disjunctive" -> (q19Disjunctive _),
    "q21_waiting" -> (q21Waiting _),
    "q22_global" -> (q22Global _),
    "events_gapfill" -> (eventsGapfill _),
    "events_anomaly_mad" -> (eventsAnomalyMad _),
    "q_cube" -> (qCube _),
    "events_interval_join" -> (eventsIntervalJoin _),
    "events_outliers" -> (eventsOutliers _),
    "events_sliding" -> (eventsSliding _),
    "events_value_quantiles" -> (eventsValueQuantiles _),
    "events_props_json" -> (eventsPropsJson _),
    "q_supplier_top" -> (qSupplierTop _),
    "events_retention" -> (eventsRetention _),
    "events_user_stats" -> (eventsUserStats _),
    "q_ship_delay_hist" -> (qShipDelayHist _),
    "events_asof" -> (eventsAsof _),
    "events_funnel" -> (eventsFunnel _),
    "events_pivot" -> (eventsPivot _),
    "q_part_stats" -> (qPartStats _),
    "events_value_hist" -> (eventsValueHist _),
    "events_distinct" -> (eventsDistinct _),
    "q1_pricing" -> (q1Pricing _),
    "q4_semi" -> (q4Semi _),
    "q_antijoin" -> (qAntijoin _),
    "q_rollup" -> (qRollup _),
    "q6_forecast" -> (q6Forecast _),
    "q17_avg_sub" -> (q17AvgSub _),
    "q3_revenue_topn" -> (q3RevenueTopN _),
    "q5_nation_revenue" -> (q5NationRevenue _),
    "q_window_rank" -> (qWindowRank _),
    "events_sessionize" -> (eventsSessionize _),
    "events_tumbling" -> (eventsTumbling _))

  val oracles: Map[String, String] = Map(
    "events_type_trigrams" -> eventsTypeTrigramsSql,
    "events_markov" -> eventsMarkovSql,
    "q_basket_pairs" -> qBasketPairsSql,
    "events_drift" -> eventsDriftSql,
    "q7_nation_volume" -> q7NationVolumeSql,
    "q8_market_share" -> q8MarketShareSql,
    "events_ntile" -> eventsNtileSql,
    "q13_custdist" -> q13CustdistSql,
    "q18_big_orders" -> q18BigOrdersSql,
    "q19_disjunctive" -> q19DisjunctiveSql,
    "q21_waiting" -> q21WaitingSql,
    "q22_global" -> q22GlobalSql,
    "events_gapfill" -> eventsGapfillSql,
    "events_anomaly_mad" -> eventsAnomalyMadSql,
    "q_cube" -> qCubeSql,
    "events_interval_join" -> eventsIntervalJoinSql,
    "events_outliers" -> eventsOutliersSql,
    "events_sliding" -> eventsSlidingSql,
    "events_value_quantiles" -> eventsValueQuantilesSql,
    "events_props_json" -> eventsPropsJsonSql,
    "q_supplier_top" -> qSupplierTopSql,
    "events_retention" -> eventsRetentionSql,
    "events_user_stats" -> eventsUserStatsSql,
    "q_ship_delay_hist" -> qShipDelayHistSql,
    "events_asof" -> eventsAsofSql,
    "events_funnel" -> eventsFunnelSql,
    "events_pivot" -> eventsPivotSql,
    "q_part_stats" -> qPartStatsSql,
    "events_value_hist" -> eventsValueHistSql,
    "events_distinct" -> eventsDistinctSql,
    "q1_pricing" -> q1PricingSql,
    "q4_semi" -> q4SemiSql,
    "q_antijoin" -> qAntijoinSql,
    "q_rollup" -> qRollupSql,
    "q6_forecast" -> q6ForecastSql,
    "q17_avg_sub" -> q17AvgSubSql,
    "q3_revenue_topn" -> q3RevenueTopNSql,
    "q5_nation_revenue" -> q5NationRevenueSql,
    "q_window_rank" -> qWindowRankSql,
    "events_sessionize" -> eventsSessionizeSql,
    "events_tumbling" -> eventsTumblingSql)
}
