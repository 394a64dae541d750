package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The remaining nine TPC-H query shapes (Q2, Q9–Q16 gaps, Q20),
  * completing the full 22-query relational sweep alongside
  * Relational.scala's thirteen. The testdata has no `partsupp` table,
  * so the shapes that need a part–supplier relation (Q2/Q9/Q11/Q16/
  * Q20) derive the bridge from `lineitem`'s (l_partkey, l_suppkey)
  * pairs — the PLAN shape each query exists to exercise (correlated
  * min, fraction-of-global HAVING, distinct-count with exclusion,
  * nested correlated-threshold semi-join) is preserved exactly.
  *
  * Exactness discipline matches Relational.scala: money in integer
  * cents, thresholds as integer cross-multiplications (widened to
  * DECIMAL(38,0)/HUGEINT where a product could exceed Int64 at large
  * corpora), doubles only in final reporting divisions, every ORDER BY
  * carries a unique tiebreak.
  *
  * Scale posture: every aggregate is a single map-side-combinable
  * shuffle on its natural key; dimension tables (part, supplier,
  * nation, region) broadcast; global scalars (Q11's total, Q15's max)
  * are one-row aggregates broadcast back — no second scan of the fact
  * table; Q20 folds its two per-pair sums into ONE conditional
  * aggregation pass instead of two shuffles over lineitem.
  */
object TpcFull {
  private def cents(c: String) = round(col(c) * 100).cast("long")

  // ---------------------------------------------------------------
  // Q2 — minimum-cost supplier per part (correlated MIN subquery).
  // Cost of a (part, supplier) pair = the cheapest single lineitem
  // ever shipped between them, in exact cents. Keep the pairs that
  // achieve their part's minimum, restricted to SMALL parts under
  // size 16 and EUROPE suppliers; report by supplier balance.
  // ---------------------------------------------------------------
  def q2MinCost(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val pairs = li.groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg(min(cents("l_extendedprice")).as("cost_cents"))
    val pmin = pairs.groupBy("pk").agg(min("cost_cents").as("mc"))
    val part = Tables.load(s, dir, "part")
      .filter(col("p_type") === "SMALL" && col("p_size") < 16)
      .select(col("p_partkey"))
    val natEu = Tables.load(s, dir, "nation")
      .join(broadcast(Tables.load(s, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val supp = Tables.load(s, dir, "supplier")
      .join(broadcast(natEu), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    pairs
      .join(pmin, Seq("pk"))
      .filter(col("cost_cents") === col("mc"))
      .join(broadcast(part), col("pk") === col("p_partkey"))
      .join(broadcast(supp), col("sk") === col("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("cost_cents"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  val q2MinCostSql: String =
    """WITH pairs AS (SELECT l_partkey AS pk, l_suppkey AS sk,
      |  CAST(min(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS cost_cents
      | FROM lineitem GROUP BY 1, 2),
      |pmin AS (SELECT pk, min(cost_cents) AS mc FROM pairs GROUP BY 1)
      |SELECT s_acctbal, s_name, n_name, p_partkey, cost_cents
      |FROM pairs JOIN pmin USING (pk)
      |JOIN part ON p_partkey = pk
      |JOIN supplier ON s_suppkey = sk
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE cost_cents = mc AND p_type = 'SMALL' AND p_size < 16 AND r_name = 'EUROPE'
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  // ---------------------------------------------------------------
  // Q9 — product-type profit by nation and year. Without
  // ps_supplycost, unit cost is the part's retail price: amount =
  // extprice·(1−discount) − retailprice·quantity, carried at the
  // exact 10⁻⁴-dollar integer scale throughout.
  // ---------------------------------------------------------------
  def q9Profit(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(s, dir, "part")
      .filter(col("p_name").contains("widget"))
      .select(col("p_partkey"), cents("p_retailprice").as("rp_cents"))
    val supp = Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val nat = Tables.load(s, dir, "nation").select("n_nationkey", "n_name")
    val ord = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val li = Tables.load(s, dir, "lineitem")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("n_name"), col("o_year"),
        (cents("l_extendedprice") * (lit(100L) - cents("l_discount")) -
          col("rp_cents") * col("l_quantity").cast("long") * 100L).as("amount_e4"))
      .groupBy("n_name", "o_year")
      .agg((sum(col("amount_e4")).cast("double") / 10000.0).as("profit"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  val q9ProfitSql: String =
    """SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
      | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      |     * (100 - CAST(round(l_discount*100) AS BIGINT))
      |   - CAST(round(p_retailprice*100) AS BIGINT)
      |     * CAST(l_quantity AS BIGINT) * 100) AS DOUBLE) / 10000.0 AS profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE p_name LIKE '%widget%'
      |GROUP BY 1, 2 ORDER BY n_name, o_year DESC""".stripMargin

  // ---------------------------------------------------------------
  // Q10 — top returned-item customers for one order quarter: revenue
  // lost to 'R'-flag lineitems per customer, top 20.
  // ---------------------------------------------------------------
  def q10Returned(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (cents("l_extendedprice") * (lit(100L) - cents("l_discount"))).as("rev"))
    val cust = Tables.load(s, dir, "customer")
    val nat = Tables.load(s, dir, "nation").select("n_nationkey", "n_name")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(col("rev")).as("rev_e4"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"),
        (col("rev_e4").cast("double") / 10000.0).as("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10ReturnedSql: String =
    """SELECT c_custkey, c_name,
      | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      |   * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 AS revenue,
      | c_acctbal, n_name
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
      |GROUP BY 1, 2, 4, 5 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------------
  // Q11 — important stock: per-part value of the ASIA-supplier trade,
  // kept when the part's share exceeds 2× the mean share. The global
  // (total, n_parts) scalar is one broadcast row; the HAVING is the
  // exact cross-multiplication val·np > 2·tot, widened to
  // DECIMAL(38,0) (HUGEINT in the oracle) so the product can never
  // wrap Int64 however large the corpus.
  // ---------------------------------------------------------------
  def q11Important(s: SparkSession, dir: String): DataFrame = {
    val suppAsia = Tables.load(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      .join(broadcast(Tables.load(s, dir, "nation").select("n_nationkey", "n_regionkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey")
    val v = Tables.load(s, dir, "lineitem")
      .join(broadcast(suppAsia), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(cents("l_extendedprice")).as("val_cents"))
    val t = v.agg(sum("val_cents").as("tot"), count(lit(1)).as("np"))
    v.crossJoin(broadcast(t))
      .filter(col("val_cents").cast("decimal(38,0)") * col("np") >
        col("tot").cast("decimal(38,0)") * 2L)
      .select(col("pk"), col("val_cents"))
      .orderBy(col("val_cents").desc, col("pk"))
  }

  val q11ImportantSql: String =
    """WITH v AS (SELECT l_partkey AS pk,
      |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS val_cents
      | FROM lineitem
      | WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
      |   JOIN nation ON s_nationkey = n_nationkey
      |   JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')
      | GROUP BY 1),
      |t AS (SELECT sum(val_cents) AS tot, count(*) AS np FROM v)
      |SELECT pk, val_cents FROM v, t
      |WHERE val_cents::HUGEINT * np > tot::HUGEINT * 2
      |ORDER BY val_cents DESC, pk""".stripMargin

  // ---------------------------------------------------------------
  // Q12 — shipping-delay buckets × order-priority class: the two-way
  // conditional aggregation (CASE-WHEN counts) over a derived
  // category, Q12's signature shape with ship-delay classes standing
  // in for the absent l_shipmode column.
  // ---------------------------------------------------------------
  def q12ShipBucket(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.load(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_d", datediff(col("l_shipdate"), col("o_orderdate")))
      .withColumn("ship_bucket",
        when(col("delay_d") <= 30, "fast")
          .when(col("delay_d") <= 90, "medium").otherwise("slow"))
      .groupBy("ship_bucket")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy("ship_bucket")
  }

  val q12ShipBucketSql: String =
    """SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 'fast'
      |            WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 'medium'
      |            ELSE 'slow' END AS ship_bucket,
      | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  // Q14 — promo revenue share for one ship month: numerator and
  // denominator off ONE conditional aggregation pass (exact 10⁻⁴
  // units), the percentage a single IEEE division of the two longs.
  // ---------------------------------------------------------------
  def q14Promo(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(s, dir, "part").select("p_partkey", "p_type")
    Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .select(col("l_partkey"),
        (cents("l_extendedprice") * (lit(100L) - cents("l_discount"))).as("rev"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy()
      .agg(
        sum(when(col("p_type") === "PROMO", col("rev")).otherwise(0L)).as("promo_e4"),
        sum(col("rev")).as("total_e4"))
      .withColumn("promo_pct",
        col("promo_e4").cast("double") * 100.0 / col("total_e4").cast("double"))
  }

  val q14PromoSql: String =
    """SELECT
      | CAST(sum(CASE WHEN p_type = 'PROMO' THEN CAST(round(l_extendedprice*100) AS BIGINT)
      |   * (100 - CAST(round(l_discount*100) AS BIGINT)) ELSE 0 END) AS BIGINT) AS promo_e4,
      | CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      |   * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS total_e4,
      | CAST(sum(CASE WHEN p_type = 'PROMO' THEN CAST(round(l_extendedprice*100) AS BIGINT)
      |   * (100 - CAST(round(l_discount*100) AS BIGINT)) ELSE 0 END) AS DOUBLE) * 100.0
      |  / CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      |   * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE) AS promo_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin

  // ---------------------------------------------------------------
  // Q15 — top supplier(s) by one quarter's revenue: the revenue view,
  // its global max as a one-row broadcast scalar, and the exact
  // equality join back — returns precisely the argmax set.
  // ---------------------------------------------------------------
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey").as("sk"))
      .agg(sum(cents("l_extendedprice") * (lit(100L) - cents("l_discount"))).as("rev_e4"))
    val mx = rev.agg(max("rev_e4").as("mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("rev_e4") === col("mx"))
      .join(broadcast(Tables.load(s, dir, "supplier").select("s_suppkey", "s_name")),
        col("sk") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_e4").cast("double") / 10000.0).as("total_rev"))
      .orderBy("s_suppkey")
  }

  val q15TopSupplierSql: String =
    """WITH rev AS (SELECT l_suppkey AS sk,
      |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
      |    * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS rev_e4
      | FROM lineitem
      | WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      | GROUP BY 1)
      |SELECT s_suppkey, s_name, CAST(rev_e4 AS DOUBLE)/10000.0 AS total_rev
      |FROM rev JOIN supplier ON s_suppkey = sk
      |WHERE rev_e4 = (SELECT max(rev_e4) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------
  // Q16 — supplier count by part attributes, with an excluded-
  // supplier anti-join (balance under $1000 standing in for the
  // complaints predicate): distinct bridge pairs, broadcast anti-join,
  // distinct-count per (brand, type, size).
  // ---------------------------------------------------------------
  def q16SupplierCnt(s: SparkSession, dir: String): DataFrame = {
    val bridge = Tables.load(s, dir, "lineitem")
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk")).distinct()
    val excluded = Tables.load(s, dir, "supplier")
      .filter(col("s_acctbal") < 1000.0).select(col("s_suppkey").as("xk"))
    val part = Tables.load(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    bridge
      .join(broadcast(excluded), col("sk") === col("xk"), "left_anti")
      .join(broadcast(part), col("pk") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("sk")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q16SupplierCntSql: String =
    """WITH bridge AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem)
      |SELECT p_brand, p_type, p_size,
      | CAST(count(DISTINCT sk) AS BIGINT) AS supplier_cnt
      |FROM bridge JOIN part ON p_partkey = pk
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      |  AND sk NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // ---------------------------------------------------------------
  // Q20 — potential part promotion: suppliers of 'bolt' parts whose
  // 1997 shipped quantity exceeds half their all-time quantity for
  // that part. Both per-pair sums come off ONE conditional
  // aggregation pass over lineitem (not two shuffles); the correlated
  // threshold is the exact integer cross-multiplication q97·2 > qall.
  // ---------------------------------------------------------------
  def q20Potential(s: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.load(s, dir, "lineitem")
      .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg(
        sum(when(year(col("l_shipdate")) === 1997, col("l_quantity").cast("long"))
          .otherwise(0L)).as("q97"),
        sum(col("l_quantity").cast("long")).as("qall"))
      .filter(col("q97") * 2L > col("qall"))
    val part = Tables.load(s, dir, "part")
      .filter(col("p_name").contains("bolt")).select("p_partkey")
    val supp = Tables.load(s, dir, "supplier")
      .join(broadcast(Tables.load(s, dir, "nation").select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "n_name")
    pairs
      .join(broadcast(part), col("pk") === col("p_partkey"))
      .join(broadcast(supp), col("sk") === col("s_suppkey"))
      .groupBy("s_name", "n_name")
      .agg(count(lit(1)).as("n_parts"))
      .orderBy("s_name")
  }

  val q20PotentialSql: String =
    """WITH pairs AS (SELECT l_partkey AS pk, l_suppkey AS sk,
      |  CAST(sum(CASE WHEN year(l_shipdate) = 1997 THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q97,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qall
      | FROM lineitem GROUP BY 1, 2)
      |SELECT s_name, n_name, CAST(count(*) AS BIGINT) AS n_parts
      |FROM pairs
      |JOIN part ON p_partkey = pk
      |JOIN supplier ON s_suppkey = sk
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE q97 * 2 > qall AND p_name LIKE '%bolt%'
      |GROUP BY 1, 2 ORDER BY s_name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost" -> (q2MinCost _),
    "q9_profit" -> (q9Profit _),
    "q10_returned" -> (q10Returned _),
    "q11_important" -> (q11Important _),
    "q12_ship_bucket" -> (q12ShipBucket _),
    "q14_promo" -> (q14Promo _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q16_supplier_cnt" -> (q16SupplierCnt _),
    "q20_potential" -> (q20Potential _))

  val oracles: Map[String, String] = Map(
    "q2_min_cost" -> q2MinCostSql,
    "q9_profit" -> q9ProfitSql,
    "q10_returned" -> q10ReturnedSql,
    "q11_important" -> q11ImportantSql,
    "q12_ship_bucket" -> q12ShipBucketSql,
    "q14_promo" -> q14PromoSql,
    "q15_top_supplier" -> q15TopSupplierSql,
    "q16_supplier_cnt" -> q16SupplierCntSql,
    "q20_potential" -> q20PotentialSql)
}
