package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Round 13: the relational core widens with the harder TPC-H shapes
  * (Q13 outer-join double aggregation, Q18 aggregate-HAVING semi-join,
  * Q19 disjunctive-predicate join, Q21 double-correlated subqueries,
  * Q22 scalar-subquery + anti join). Each test pins the semantic that
  * distinguishes the shape — zero-group survival, threshold
  * strictness, branch disjointness, exists/not-exists interplay, and
  * the exact integer average comparison. */
class Round13Spec extends SparkTestBase {
  import spark.implicits._

  // ------------------------------------------------------------- q13

  test("q13: zero-order customers survive the outer join and counts conserve") {
    val got = Relational.q13Custdist(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    val cust = Tables.load(spark, sfDir, "customer").select("c_custkey")
    val nCust = cust.count()
    // Σ custdist over all buckets == |customer| (every customer lands
    // in exactly one count bucket, zero included)
    assert(got.values.sum == nCust, "customers lost or duplicated across buckets")
    // independent zero-bucket count: customers with no non-urgent order
    val withOrd = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey").as("c_custkey")).distinct()
    val nZero = nCust - cust.join(withOrd, "c_custkey").count()
    assert(got.getOrElse(0L, 0L) == nZero, "zero-order bucket wrong")
  }

  // ------------------------------------------------------------- q18

  test("q18: exactly the orders over the quantity threshold, qty exact") {
    val got = Relational.q18BigOrders(spark, sfDir)
      .select("o_orderkey", "sum_qty").as[(Long, Long)].collect().toMap
    val truth = Tables.load(spark, sfDir, "lineitem")
      .groupBy("l_orderkey").agg(sum(col("l_quantity").cast("long")).as("q"))
      .filter(col("q") > Relational.BigOrderQty)
      .as[(Long, Long)].collect().toMap
    assert(got == truth, "threshold set or quantities differ")
    assert(got.nonEmpty, "vacuous: no order clears the threshold at this SF")
    assert(got.values.forall(_ > Relational.BigOrderQty))
  }

  // ------------------------------------------------------------- q19

  test("q19: the disjunction is the sum of its (brand-disjoint) branches") {
    // branches differ in p_brand, so they partition the match set —
    // total revenue must equal the sum of three single-branch runs
    val li = Tables.load(spark, sfDir, "lineitem")
    val pt = Tables.load(spark, sfDir, "part")
    def branch(brand: String, szHi: Int, qLo: Int, qHi: Int): Long =
      li.join(pt, col("l_partkey") === col("p_partkey"))
        .filter(col("p_brand") === brand && col("p_size").between(1, szHi) &&
          col("l_quantity").between(qLo, qHi))
        .agg(coalesce(sum(
          (round(col("l_extendedprice") * 100).cast("long")) *
            (lit(100L) - round(col("l_discount") * 100).cast("long"))), lit(0L)))
        .as[Long].head()
    val parts = branch("Brand#11", 15, 1, 20) + branch("Brand#22", 25, 10, 35) +
      branch("Brand#33", 35, 20, 50)
    val got = Relational.q19Disjunctive(spark, sfDir).as[Double].head()
    assert(got == parts.toDouble / 10000.0, "disjunction != sum of branches")
    assert(got > 0, "vacuous: no branch matched at this SF")
  }

  // ------------------------------------------------------------- q21

  test("q21: planted orders pin the exists/not-exists interplay") {
    val li = Seq(
      // order 100 (F): supp 1 has the lone R, supp 2 clean -> supp 1 waits
      (100L, 1L, "R"), (100L, 2L, "N"),
      // order 200 (F): both have R -> nobody (NOT EXISTS fails for both)
      (200L, 1L, "R"), (200L, 2L, "R"),
      // order 300 (F): single-supplier R -> excluded (EXISTS fails)
      (300L, 3L, "R"),
      // order 400 (O): would qualify but the order is not finished
      (400L, 1L, "R"), (400L, 2L, "N"),
      // order 500 (F): supp 3 R twice + supp 2 clean -> 2 waits for supp 3
      (500L, 3L, "R"), (500L, 3L, "R"), (500L, 2L, "N")
    ).toDF("l_orderkey", "l_suppkey", "l_returnflag")
    val ord = Seq((100L, "F"), (200L, "F"), (300L, "F"), (400L, "O"), (500L, "F"))
      .toDF("o_orderkey", "o_orderstatus")
    val supp = Seq((1L, "s1"), (2L, "s2"), (3L, "s3"))
      .toDF("s_suppkey", "s_name")
    val got = Relational.q21Core(li, ord, supp)
      .as[(String, Long)].collect().toMap
    assert(got == Map("s1" -> 1L, "s3" -> 2L), s"got $got")
  }

  // ------------------------------------------------------------- q22

  test("q22: the integer cross-multiply average test is strict and exact") {
    // positive balances 100, 200, 300 -> avg 200 exactly. The customer
    // AT the average (custkey 2) must be excluded (strict >), 300 kept;
    // negative balance never enters the average. custkey 3 is killed by
    // the urgent-order anti join, so only custkey 10 (cb 300... wait:
    // plant a second above-average customer to survive).
    val c = Seq((1L, 100L), (2L, 200L), (3L, 300L), (10L, 201L), (4L, -500L))
      .toDF("c_custkey", "cb")
    // avg over positives = (100+200+300+201)/4 = 200.25 -> strict test:
    // cb*4 > 801 -> 300 (1200) and 201 (804) pass, 200 (800) fails
    val urgent = Seq(3L).toDF("o_custkey")
    val got = Relational.q22Core(c, urgent)
      .select("cntrycode", "numcust", "totacctbal")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((3L, 1L, 2.01)), s"got $got") // custkey 10 % 7 = 3, cb 201
  }

  test("q22: a customer exactly at an integer average is excluded") {
    val c = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("c_custkey", "cb")
    // avg = 200 exactly; only 300 clears the strict inequality
    val keys = Relational.q22Core(c, spark.emptyDataset[Long].toDF("o_custkey"))
      .select("numcust").as[Long].collect().toList
    assert(keys.sum == 1L, s"expected only the 300-balance customer, got $keys")
  }
}
