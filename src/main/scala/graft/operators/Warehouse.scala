package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Warehouse-dimensional shapes beyond the TPC-H sweep: the SCD2
  * temporal-validity join (enrich facts with the dimension attribute
  * valid AT FACT TIME — the slowly-changing-dimension pattern every
  * warehouse runs) and the exact correlation-matrix profile (the
  * feature-correlation table a dataset-curation pass emits).
  *
  * Exactness discipline as everywhere in graft: money in integer
  * cents, correlation moments as exact integer sums with ONE final
  * IEEE division/sqrt (correctly rounded and therefore cross-engine
  * deterministic given identical integer inputs).
  */
object Warehouse {
  private def cents(c: String) = round(col(c) * 100).cast("long")

  // ---------------------------------------------------------------
  // SCD2 as-of join. The versioned dimension derives from orders:
  // each order sets its customer's "current priority" from its order
  // date until the customer's next order (valid_to = lead(valid_from),
  // open-ended last version). Facts are lineitems stamped with their
  // ship date; each joins the version whose [valid_from, valid_to)
  // interval holds the ship date. The intervals are disjoint and
  // cover the timeline from the customer's first order on, so a fact
  // matches AT MOST one version; facts shipping before the first
  // version (this synthetic data has ship < order rows) drop with
  // inner-join semantics — matched + pre-history == total, spec'd.
  // Ties on (custkey, orderdate) produce zero-width intervals that
  // match nothing, deterministically in both engines.
  //
  // Plan shape: the dimension's window is one shuffle by custkey; the
  // fact join is a plain equi-join on custkey with the range predicate
  // as a residual filter — never a cartesian. Versions per customer
  // are bounded by their order count, so the residual scan is short.
  // ---------------------------------------------------------------
  def qScd2Join(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val dim = ord
      .withColumn("valid_to", lead(col("o_orderdate"), 1).over(w))
      .select(col("o_custkey").as("d_cust"), col("o_orderdate").as("valid_from"),
        col("valid_to"), col("o_orderpriority").as("prio"))
    val fact = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"),
        (cents("l_extendedprice") * (lit(100L) - cents("l_discount"))).as("rev"))
      .join(ord.select(col("o_orderkey"), col("o_custkey").as("f_cust")),
        col("l_orderkey") === col("o_orderkey"))
    fact.join(dim,
        col("f_cust") === col("d_cust") &&
          col("l_shipdate") >= col("valid_from") &&
          (col("valid_to").isNull || col("l_shipdate") < col("valid_to")))
      .groupBy(col("prio").as("prio_at_ship"))
      .agg(count(lit(1)).as("n_lines"),
        (sum(col("rev")).cast("double") / 10000.0).as("revenue"))
      .orderBy("prio_at_ship")
  }

  val qScd2JoinSql: String =
    """WITH dim AS (SELECT o_custkey AS d_cust, o_orderdate AS valid_from,
      |  lead(o_orderdate) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) AS valid_to,
      |  o_orderpriority AS prio FROM orders),
      |fact AS (SELECT o_custkey AS f_cust, l_shipdate,
      |  CAST(round(l_extendedprice*100) AS BIGINT)
      |    * (100 - CAST(round(l_discount*100) AS BIGINT)) AS rev
      | FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
      |SELECT prio AS prio_at_ship, CAST(count(*) AS BIGINT) AS n_lines,
      | CAST(sum(rev) AS DOUBLE)/10000.0 AS revenue
      |FROM fact JOIN dim ON f_cust = d_cust AND l_shipdate >= valid_from
      |  AND (valid_to IS NULL OR l_shipdate < valid_to)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  // Exact correlation matrix over per-user event-type activity: for
  // every unordered type pair, the Pearson correlation of per-user
  // counts — reported WITH its exact integer moments (n, Σx, Σy, Σxy,
  // Σx², Σy²) so a consumer can re-derive or re-combine; the
  // correlation itself is one IEEE division of the exact integer
  // numerator by the sqrt of a two-double product (both correctly
  // rounded, so cross-engine bit-equal given equal integers).
  //
  // Scale shape: ONE map-side-combinable groupBy(user) builds the
  // count vectors; ONE single-row global aggregate folds all 20
  // moments; the 10 pair rows explode from that one row — the fact
  // table is scanned exactly once and |types|² bounds the output.
  // Per-user moments stay Int64 (bounded by per-user activity²); the
  // GLOBAL sums accumulate in DECIMAL(38,0) / HUGEINT (a plain long
  // sum() would wrap silently in non-ANSI mode once Σ c_a·c_b crosses
  // 2⁶³ — ~10¹² users at 10⁶ per-user products), and the n·Σxy-class
  // PRODUCTS stay in the same 38-digit arithmetic — exact at any
  // corpus size, never a silent wrap.
  // ---------------------------------------------------------------
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")
  private val TypePairs =
    for { i <- EventTypes.indices; j <- i + 1 until EventTypes.size }
      yield (EventTypes(i), EventTypes(j))

  def eventsCorr(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val cCols = EventTypes.map(t =>
      sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"c_$t"))
    corrFromPerUser(ev.groupBy("user_id").agg(cCols.head, cCols.tail: _*))
  }

  /** Graded output contract: moments EMIT as BIGINT. Accumulation and
    * the n·Σxy-class products stay decimal(38,0) (wrap-proof), but the
    * emitted sums cast back to long behind a loud range check — an
    * out-of-Int64 corpus fails the query noisily (widen the output
    * contract then) instead of shipping a schema the gate's canonical
    * string hashing renders differently per engine (Spark decimal128
    * `Decimal('19863')` vs DuckDB-pandas float64 `19863.0`). Same
    * discipline as bm25_wide's CAST(sum(..) AS BIGINT). */
  private val MomentCols = Seq("sx", "sy", "sxy", "sxx", "syy")
  private def longChecked(nm: String): Column = {
    val c   = col(nm)
    val lim = lit(Long.MaxValue).cast("decimal(38,0)")
    val lo  = lit(Long.MinValue).cast("decimal(38,0)")
    when(c > lim || c < lo, raise_error(format_string(
      "events_corr: moment %s = %s outside Int64 range — widen the output contract",
      lit(nm), c.cast("string"))).cast("decimal(38,0)"))
      .otherwise(c).cast("long").as(nm)
  }

  private[graft] def corrFromPerUser(per: DataFrame): DataFrame = {
    val wideMom = corrFromPerUserWide(per)
    wideMom.select(
      (Seq("type_a", "type_b", "n").map(col) ++
        MomentCols.map(longChecked) :+ col("corr")): _*)
      .orderBy("type_a", "type_b")
  }

  /** Moments + correlation over a per-user count table (c_<type> long
    * columns), moments still decimal(38,0) — the seam the
    * wrap-proofing spec injects through: Round16Spec feeds synthetic
    * per-user counts whose moment sums genuinely exceed Int64 and pins
    * the decimal accumulators against a driver-side BigInt replay. */
  private[graft] def corrFromPerUserWide(per: DataFrame): DataFrame = {
    // widen INSIDE the aggregate: the per-user terms are Int64-safe,
    // but their corpus-wide sums accumulate in decimal(38,0) so the
    // accumulator itself can never wrap (DuckDB's sum(BIGINT) returns
    // HUGEINT for the same reason)
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val momCols: Seq[Column] =
      Seq(count(lit(1)).as("n")) ++
        EventTypes.map(t => sum(d38(col(s"c_$t"))).as(s"s_$t")) ++
        EventTypes.map(t => sum(d38(col(s"c_$t")) * col(s"c_$t")).as(s"ss_$t")) ++
        TypePairs.map { case (a, b) =>
          sum(d38(col(s"c_$a")) * col(s"c_$b")).as(s"sp_${a}_$b") }
    val mom = per.agg(momCols.head, momCols.tail: _*)
    val pairRows = array(TypePairs.map { case (a, b) =>
      struct(lit(a).as("type_a"), lit(b).as("type_b"), col("n"),
        col(s"s_$a").as("sx"), col(s"s_$b").as("sy"),
        col(s"sp_${a}_$b").as("sxy"),
        col(s"ss_$a").as("sxx"), col(s"ss_$b").as("syy"))
    }: _*)
    // moment PRODUCTS widen to DECIMAL(38,0) (the q11 pattern): in
    // non-ANSI Spark an Int64 n·Σxy wrap would return a silently wrong
    // corr where the twin errors loudly — exact 38-digit intermediates
    // make the corpora beyond the certified SFs correct, not quiet
    val wide = (c: Column) => c.cast("decimal(38,0)")
    val num = wide(col("n")) * col("sxy") - wide(col("sx")) * col("sy")
    val da = wide(col("n")) * col("sxx") - wide(col("sx")) * col("sx")
    val db = wide(col("n")) * col("syy") - wide(col("sy")) * col("sy")
    mom.select(explode(pairRows).as("r")).select(col("r.*"))
      .withColumn("corr",
        when(da > lit(0) && db > lit(0),
          num.cast("double") / sqrt(da.cast("double") * db.cast("double"))))
  }

  val eventsCorrSql: String = {
    val perCols = EventTypes.map(t =>
      s"CAST(sum(CASE WHEN event_type='$t' THEN 1 ELSE 0 END) AS BIGINT) AS c_$t")
      .mkString(",\n  ")
    val momCols = (
      Seq("CAST(count(*) AS BIGINT) AS n") ++
        EventTypes.map(t => s"CAST(sum(c_$t) AS DECIMAL(38,0)) AS s_$t") ++
        EventTypes.map(t => s"CAST(sum(c_$t*c_$t) AS DECIMAL(38,0)) AS ss_$t") ++
        TypePairs.map { case (a, b) =>
          s"CAST(sum(c_$a*c_$b) AS DECIMAL(38,0)) AS sp_${a}_$b" }
      ).mkString(",\n  ")
    val branches = TypePairs.map { case (a, b) =>
      s"SELECT '$a' AS type_a, '$b' AS type_b, n, s_$a AS sx, s_$b AS sy, " +
        s"sp_${a}_$b AS sxy, ss_$a AS sxx, ss_$b AS syy FROM mom"
    }.mkString("\n  UNION ALL ")
    s"""WITH per AS (SELECT user_id,
       |  $perCols
       | FROM events GROUP BY 1),
       |mom AS (SELECT
       |  $momCols
       | FROM per),
       |pr AS (
       |  $branches)
       |SELECT type_a, type_b, n,
       | CAST(sx AS BIGINT) AS sx, CAST(sy AS BIGINT) AS sy,
       | CAST(sxy AS BIGINT) AS sxy,
       | CAST(sxx AS BIGINT) AS sxx, CAST(syy AS BIGINT) AS syy,
       | CASE WHEN CAST(n AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sx > 0
       |       AND CAST(n AS HUGEINT)*syy - CAST(sy AS HUGEINT)*sy > 0
       |   THEN CAST(CAST(n AS HUGEINT)*sxy - CAST(sx AS HUGEINT)*sy AS DOUBLE)
       |     / sqrt(CAST(CAST(n AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sx AS DOUBLE)
       |          * CAST(CAST(n AS HUGEINT)*syy - CAST(sy AS HUGEINT)*sy AS DOUBLE))
       | END AS corr
       |FROM pr ORDER BY 1, 2""".stripMargin
  }

  // ---------------------------------------------------------------
  // CDC changelog apply — the Delta/Hudi "compact the changelog into
  // a snapshot" kernel. The changelog derives deterministically from
  // events: key = user_id, change sequence = (ts, event_id) (event_id
  // is unique, so the order is total), op = delete when the event is
  // an 'error', else upsert carrying the value in cents. Snapshot =
  // last-writer-wins per key; keys whose FINAL op is a delete leave
  // the snapshot entirely (but still count their change history).
  //
  // Plan shape: ONE map-side-combinable groupBy(key) — the head
  // record rides a max(struct(ts, event_id, op, vc)) whose comparison
  // is decided by the unique (ts, event_id) prefix, so partial
  // aggregation folds the changelog down executor-locally and only
  // one combined row per key ever shuffles. At 100 TB this is the
  // standard CDC compaction: changelog and snapshot bucketed by
  // key-hash, the apply co-partitioned, no sort anywhere.
  // ---------------------------------------------------------------
  private def changelog(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events").select(
      col("user_id"), col("ts").as("tsn"), col("event_id"),
      when(col("event_type") === "error", 0L).otherwise(1L).as("op"),
      cents("value").as("vc"))

  def warehouseCdc(s: SparkSession, dir: String): DataFrame =
    changelog(s, dir)
      .groupBy("user_id")
      .agg(max(struct(col("tsn"), col("event_id"), col("op"), col("vc")))
          .as("head"),
        count(lit(1)).as("n_changes"),
        sum(lit(1L) - col("op")).as("n_deletes"))
      .filter(col("head.op") === 1L)
      .select(col("user_id"), col("head.vc").as("value_cents"),
        col("n_changes"), col("n_deletes"),
        expr("head.tsn div 1000").as("last_ts_us"))
      .orderBy("user_id")

  val warehouseCdcSql: String =
    """WITH ch AS (SELECT user_id, epoch_ns(ts) AS tsn, event_id,
      |  CASE WHEN event_type = 'error' THEN 0 ELSE 1 END AS op,
      |  CAST(round(value*100) AS BIGINT) AS vc FROM events),
      |r AS (SELECT user_id, tsn, op, vc,
      |  row_number() OVER (PARTITION BY user_id
      |    ORDER BY tsn DESC, event_id DESC) AS rn,
      |  count(*) OVER (PARTITION BY user_id) AS n_changes,
      |  sum(1 - op) OVER (PARTITION BY user_id) AS n_deletes FROM ch)
      |SELECT user_id, vc AS value_cents,
      |  CAST(n_changes AS BIGINT) AS n_changes,
      |  CAST(n_deletes AS BIGINT) AS n_deletes,
      |  tsn // 1000 AS last_ts_us
      |FROM r WHERE rn = 1 AND op = 1 ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------
  // Snapshot diff — "what changed between T1 and T2" over the same
  // changelog, the table-diff every incremental pipeline audits with.
  // T1 = the midpoint of the observed change-sequence span (a scalar
  // aggregate broadcast as one row, the q22 pattern); T2 = head. BOTH
  // snapshots come off ONE changelog scan via conditional aggregation
  // — head_a = max(struct) over rows at-or-before the split, head_b
  // over all rows — so the diff is a single groupBy(key) with no
  // self-join and no second scan. Rows emit only when the key's
  // visible state differs: added (live at T2 only), removed (live at
  // T1 only — i.e. deleted since), changed (live in both, value
  // moved); unchanged keys produce nothing, which is what bounds the
  // output by the churn, not the table.
  // ---------------------------------------------------------------
  def warehouseDiff(s: SparkSession, dir: String): DataFrame = {
    val ch = changelog(s, dir)
    val sp = ch.agg(expr("min(tsn) + (max(tsn) - min(tsn)) div 2").as("split"))
    val rec = struct(col("tsn"), col("event_id"), col("op"), col("vc"))
    val snap = ch.crossJoin(broadcast(sp))
      .groupBy("user_id")
      .agg(max(when(col("tsn") <= col("split"), rec)).as("ha"),
        max(rec).as("hb"))
    snap.select(col("user_id"),
        when(col("ha.op") === 1L, col("ha.vc")).as("old_value_cents"),
        when(col("hb.op") === 1L, col("hb.vc")).as("new_value_cents"))
      .withColumn("status",
        when(col("old_value_cents").isNull && col("new_value_cents").isNotNull,
          "added")
          .when(col("old_value_cents").isNotNull && col("new_value_cents").isNull,
            "removed")
          .when(col("old_value_cents") =!= col("new_value_cents"), "changed"))
      .filter(col("status").isNotNull)
      .select(col("user_id"), col("status"),
        col("old_value_cents"), col("new_value_cents"))
      .orderBy("user_id")
  }

  val warehouseDiffSql: String =
    """WITH ch AS (SELECT user_id, epoch_ns(ts) AS tsn, event_id,
      |  CASE WHEN event_type = 'error' THEN 0 ELSE 1 END AS op,
      |  CAST(round(value*100) AS BIGINT) AS vc FROM events),
      |sp AS (SELECT min(tsn) + (max(tsn) - min(tsn)) // 2 AS split FROM ch),
      |a AS (SELECT user_id, op, vc FROM (
      |  SELECT user_id, op, vc, row_number() OVER (PARTITION BY user_id
      |    ORDER BY tsn DESC, event_id DESC) AS rn FROM ch, sp
      |  WHERE tsn <= split) WHERE rn = 1),
      |b AS (SELECT user_id, op, vc FROM (
      |  SELECT user_id, op, vc, row_number() OVER (PARTITION BY user_id
      |    ORDER BY tsn DESC, event_id DESC) AS rn FROM ch) WHERE rn = 1),
      |j AS (SELECT b.user_id,
      |  CASE WHEN a.op = 1 THEN a.vc END AS old_value_cents,
      |  CASE WHEN b.op = 1 THEN b.vc END AS new_value_cents
      | FROM b LEFT JOIN a ON a.user_id = b.user_id)
      |SELECT user_id,
      |  CASE WHEN old_value_cents IS NULL AND new_value_cents IS NOT NULL
      |         THEN 'added'
      |       WHEN old_value_cents IS NOT NULL AND new_value_cents IS NULL
      |         THEN 'removed'
      |       WHEN old_value_cents <> new_value_cents THEN 'changed'
      |  END AS status, old_value_cents, new_value_cents
      |FROM j WHERE (CASE WHEN old_value_cents IS NULL
      |    AND new_value_cents IS NOT NULL THEN 'added'
      |  WHEN old_value_cents IS NOT NULL AND new_value_cents IS NULL
      |    THEN 'removed'
      |  WHEN old_value_cents <> new_value_cents THEN 'changed' END)
      |  IS NOT NULL
      |ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------
  // OHLC downsample bars — the time-series compaction every metrics /
  // market pipeline runs: per (event_type, hour) open/high/low/close/
  // volume. Open and close ride min/max over struct(ts, event_id, vc)
  // — the unique (ts, event_id) prefix decides every comparison, so
  // the bar is ONE map-side-combinable aggregate: no window, no sort,
  // one shuffle of pre-folded partials. (The batch twin of a rollup
  // a streaming pipeline maintains with four longs of state per bar.)
  // At 100 TB: grouping keys are (type, hour) — naturally bounded
  // cardinality per partition-hour — and partial agg makes the
  // shuffle O(bars), not O(events).
  // ---------------------------------------------------------------
  def eventsOhlc(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events").select(
      col("event_type"),
      expr("(ts div 3600000000000) * 3600").as("hour_start"),
      col("ts"), col("event_id"), cents("value").as("vc"))
    val rec = struct(col("ts"), col("event_id"), col("vc"))
    e.groupBy("event_type", "hour_start")
      .agg(min(rec).as("o"), max(rec).as("c"),
        max("vc").as("high_cents"), min("vc").as("low_cents"),
        count(lit(1)).as("n_events"), sum("vc").as("sum_value_cents"))
      .select(col("event_type"), col("hour_start"),
        col("o.vc").as("open_cents"), col("high_cents"), col("low_cents"),
        col("c.vc").as("close_cents"), col("n_events"),
        col("sum_value_cents"))
      .orderBy("event_type", "hour_start")
  }

  val eventsOhlcSql: String =
    """WITH e AS (SELECT event_type,
      |  (epoch_ns(ts) // 3600000000000) * 3600 AS hour_start,
      |  epoch_ns(ts) AS tsn, event_id,
      |  CAST(round(value*100) AS BIGINT) AS vc FROM events),
      |w AS (SELECT *,
      |  row_number() OVER (PARTITION BY event_type, hour_start
      |    ORDER BY tsn, event_id) AS ra,
      |  row_number() OVER (PARTITION BY event_type, hour_start
      |    ORDER BY tsn DESC, event_id DESC) AS rd FROM e)
      |SELECT event_type, CAST(hour_start AS BIGINT) AS hour_start,
      |  max(CASE WHEN ra = 1 THEN vc END) AS open_cents,
      |  max(vc) AS high_cents, min(vc) AS low_cents,
      |  max(CASE WHEN rd = 1 THEN vc END) AS close_cents,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(vc) AS BIGINT) AS sum_value_cents
      |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scd2_join" -> (qScd2Join _),
    "events_corr" -> (eventsCorr _),
    "warehouse_cdc" -> (warehouseCdc _),
    "warehouse_diff" -> (warehouseDiff _),
    "events_ohlc" -> (eventsOhlc _))

  val oracles: Map[String, String] = Map(
    "q_scd2_join" -> qScd2JoinSql,
    "events_corr" -> eventsCorrSql,
    "warehouse_cdc" -> warehouseCdcSql,
    "warehouse_diff" -> warehouseDiffSql,
    "events_ohlc" -> eventsOhlcSql)
}
