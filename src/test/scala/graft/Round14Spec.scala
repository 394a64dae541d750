package graft

import org.apache.spark.sql.functions._

import graft.operators.{Relational, TpcFull, Warehouse}
import graft.streaming.StreamingQueries

/** Round 14: the TPC-H sweep completes (Q2/Q9/Q10/Q11/Q12/Q14/Q15/
  * Q16/Q20 over the lineitem part–supplier bridge), plus the SCD2
  * temporal-validity join, the exact correlation-matrix profile, and
  * the streaming as-of enrichment twin. Each test pins the semantic
  * that distinguishes the shape — argmax-set exactness, one-scan
  * conditional aggregation, interval-partition totality, moment
  * exactness, and streaming==batch under adversarial chunking. */
class Round14Spec extends SparkTestBase {
  import spark.implicits._

  // ------------------------------------------------------------- q2

  test("q2: every reported pair achieves its part's true minimum cost") {
    val got = TpcFull.q2MinCost(spark, sfDir)
      .select("p_partkey", "cost_cents").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    val li = Tables.load(spark, sfDir, "lineitem")
    val trueMin = li.groupBy(col("l_partkey"))
      .agg(min(round(col("l_extendedprice") * 100).cast("long")).as("mc"))
      .as[(Long, Long)].collect().toMap
    got.foreach { case (pk, c) =>
      assert(c == trueMin(pk), s"part $pk: reported $c != true min ${trueMin(pk)}")
    }
  }

  // ------------------------------------------------------------- q15

  test("q15: returns exactly the argmax set of the quarter's revenue view") {
    val got = TpcFull.q15TopSupplier(spark, sfDir)
      .select("s_suppkey").as[Long].collect().toSet
    val rev = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(round(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("r"))
      .as[(Long, Long)].collect()
    val mx = rev.map(_._2).max
    assert(got == rev.filter(_._2 == mx).map(_._1).toSet)
  }

  // ------------------------------------------------------------- q20

  test("q20: ONE lineitem scan feeds both per-pair sums (conditional agg, not two shuffles)") {
    // count scan NODES whose file location is lineitem.parquet (robust
    // to plan-format/path-wrapping changes), unwrapping AQE stages
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    var liScans = 0
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case f: FileSourceScanExec =>
        if (f.relation.location.rootPaths.exists(_.toString.contains("lineitem")))
          liScans += 1
      case other => other.children.foreach(walk)
    }
    val df = TpcFull.q20Potential(spark, sfDir)
    walk(df.queryExecution.executedPlan)
    assert(liScans == 1,
      s"expected exactly one lineitem scan node, found $liScans:\n" +
        df.queryExecution.executedPlan.toString)
  }

  test("q20: threshold is strict — a pair at exactly half does not qualify") {
    // planted: 1997 qty 5 of total 10 → 5*2 > 10 is false
    val rows = Seq(
      (1L, 1L, 5L, "1997-06-01"), (1L, 1L, 5L, "1996-06-01"), // exactly half
      (2L, 1L, 6L, "1997-06-01"), (2L, 1L, 4L, "1996-06-01")  // strictly over
    ).toDF("pk", "sk", "qty", "d")
      .select(col("pk"), col("sk"), col("qty"), col("d").cast("timestamp").as("sd"))
    val pairs = rows.groupBy("pk", "sk")
      .agg(sum(when(year(col("sd")) === 1997, col("qty")).otherwise(0L)).as("q97"),
        sum(col("qty")).as("qall"))
      .filter(col("q97") * 2L > col("qall"))
      .select("pk").as[Long].collect().toSet
    assert(pairs == Set(2L))
  }

  // ------------------------------------------------------------- q11/q14 conservation

  test("q14: promo + non-promo revenue conserve to the month's total") {
    val r = TpcFull.q14Promo(spark, sfDir)
      .select("promo_e4", "total_e4", "promo_pct")
      .as[(Long, Long, Double)].head()
    assert(r._1 >= 0 && r._1 <= r._2)
    assert(math.abs(r._3 - r._1.toDouble * 100.0 / r._2.toDouble) == 0.0)
  }

  test("q12: line counts conserve to the fact-join total across buckets") {
    val got = TpcFull.q12ShipBucket(spark, sfDir)
      .select("high_line_count", "low_line_count").as[(Long, Long)].collect()
    val total = got.map(r => r._1 + r._2).sum
    assert(total == Tables.load(spark, sfDir, "lineitem").count())
  }

  // ------------------------------------------------------------- scd2

  test("scd2: at most one version matches; matched + pre-history rows conserve to the total") {
    val got = Warehouse.qScd2Join(spark, sfDir)
      .agg(sum("n_lines")).as[Long].head()
    // the disjoint [from, to) intervals make >1 match impossible; the
    // only unmatched facts are those shipping before the customer's
    // FIRST version (this synthetic data has ship < order rows)
    val ord = Tables.load(spark, sfDir, "orders")
    val firstV = ord.groupBy(col("o_custkey").as("ck"))
      .agg(min("o_orderdate").as("md"))
    val preHistory = Tables.load(spark, sfDir, "lineitem")
      .join(ord.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(firstV, col("o_custkey") === col("ck"))
      .filter(col("l_shipdate") < col("md"))
      .count()
    val total = Tables.load(spark, sfDir, "lineitem").count()
    assert(preHistory > 0, "fixture assumption: some rows ship before the first version")
    assert(got + preHistory == total,
      s"SCD2 join: $got matched + $preHistory pre-history != $total facts")
  }

  test("scd2: zero-width versions from same-day order ties match nothing, later version wins") {
    val ord = Seq(
      (10L, 100L, "2000-01-01", "3-MEDIUM"),  // tie, lower orderkey → zero-width
      (11L, 100L, "2000-01-01", "1-URGENT"),  // tie, higher orderkey → active from 1/1
      (12L, 100L, "2000-03-01", "5-LOW")      // next version
    ).toDF("o_orderkey", "o_custkey", "d", "o_orderpriority")
      .select(col("o_orderkey"), col("o_custkey"),
        col("d").cast("timestamp").as("o_orderdate"), col("o_orderpriority"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val dim = ord.withColumn("valid_to", lead(col("o_orderdate"), 1).over(w))
    val fact = Seq((100L, "2000-02-01")).toDF("cust", "fd")
      .select(col("cust"), col("fd").cast("timestamp").as("sd"))
    val hit = fact.join(dim,
        col("cust") === col("o_custkey") &&
          col("sd") >= col("o_orderdate") &&
          (col("valid_to").isNull || col("sd") < col("valid_to")))
      .select("o_orderpriority").as[String].collect().toSeq
    assert(hit == Seq("1-URGENT"), s"expected the post-tie version, got $hit")
  }

  // ------------------------------------------------------------- events_corr

  test("events_corr: moments are exact and corr matches a driver-side Pearson") {
    // the graded moments are decimal(38,0) (wrap-proof accumulators);
    // at this SF they fit in Long, so the driver twin compares as Long
    val rows = Warehouse.eventsCorr(spark, sfDir)
      .select(col("type_a"), col("type_b"), col("n"),
        col("sx").cast("long"), col("sy").cast("long"),
        col("sxy").cast("long"), col("sxx").cast("long"),
        col("syy").cast("long"), col("corr"))
      .as[(String, String, Long, Long, Long, Long, Long, Long, Option[Double])]
      .collect()
    assert(rows.length == 10)
    // driver twin: collect per-user counts once, recompute every moment
    val ev = Tables.load(spark, sfDir, "events")
      .select("user_id", "event_type").as[(Long, String)].collect()
    val types = Seq("click", "error", "purchase", "signup", "view")
    val byUser = ev.groupBy(_._1).map { case (_, es) =>
      types.map(t => es.count(_._2 == t).toLong)
    }.toSeq
    val n = byUser.length.toLong
    rows.foreach { case (ta, tb, gn, sx, sy, sxy, sxx, syy, corr) =>
      val (i, j) = (types.indexOf(ta), types.indexOf(tb))
      assert(gn == n)
      assert(sx == byUser.map(_(i)).sum && sy == byUser.map(_(j)).sum)
      assert(sxy == byUser.map(v => v(i) * v(j)).sum)
      assert(sxx == byUser.map(v => v(i) * v(i)).sum)
      assert(syy == byUser.map(v => v(j) * v(j)).sum)
      val num = (n * sxy - sx * sy).toDouble
      val den = math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
      corr.foreach { c =>
        assert(c == num / den, s"($ta,$tb): corr $c != driver ${num / den}")
        assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12)
      }
    }
  }

  test("events_corr: a planted perfectly-correlated pair scores exactly 1.0") {
    // y = 2x across three users → Pearson exactly 1 (num² == da·db in longs)
    val xs = Seq(1L, 2L, 3L); val ys = xs.map(_ * 2)
    val n = 3L
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val (sxx, syy) = (xs.map(a => a * a).sum, ys.map(b => b * b).sum)
    val num = (n * sxy - sx * sy).toDouble
    val den = math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
    assert(num / den == 1.0)
  }

  // ------------------------------------------------------------- stream_asof

  test("stream_asof == batch events_asof under 2-way, 3-way and 5-way chunking") {
    val batch = Relational.eventsAsof(spark, sfDir)
      .select("event_id", "user_id", "ts_us", "last_click_us", "gap_us")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSeq
    assert(batch.nonEmpty)
    Seq(2, 3, 5).foreach { ways =>
      val got = StreamingQueries.streamAsofChunked(spark, sfDir, ways)
        .as[(Long, Long, Long, Option[Long], Option[Long])].collect().toSeq
      assert(got == batch, s"$ways-way chunking diverges from batch")
    }
  }

  test("stream_asof: errors with no prior click surface with null enrichment") {
    val out = StreamingQueries.queries("stream_asof")(spark, sfDir)
      .filter(col("last_click_us").isNull)
    // such rows must also have null gap (null propagation, not zero)
    assert(out.filter(col("gap_us").isNotNull).count() == 0)
  }
}
