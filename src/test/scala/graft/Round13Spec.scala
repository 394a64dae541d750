package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, GraphRank, Relational, TextOps}

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

  // ------------------------------------------------------ graph_kcore

  test("kcore: planted clique survives, pendant cascade peels in order") {
    // K13 clique (deg 12 >= k=11): in-core. Node 60 hangs off 11
    // degree-1 pendants (70..80): the pendants peel in round 1, which
    // drops 60 from deg 11 to 0 -> peeled round 2 (the cascade).
    val clique = for (i <- 0L until 13L; j <- (i + 1) until 13L) yield (i, j)
    val star = (70L to 80L).map(p => (60L, p))
    val edges = (clique ++ star).toDF("src", "dst")
    val got = GraphRank.kcoreOverEdges(edges)
      .as[(Long, Long, Long)].collect()
      .map { case (id, d0, pr) => id -> ((d0, pr)) }.toMap
    for (i <- 0L until 13L)
      assert(got(i) == ((12L, 0L)), s"clique node $i: ${got(i)}")
    assert(got(60L) == ((11L, 2L)), s"hub: ${got(60L)}")
    for (p <- 70L to 80L)
      assert(got(p) == ((1L, 1L)), s"pendant $p: ${got(p)}")
  }

  test("kcore: fixpoint guard fires loudly on a cascade deeper than T") {
    // Chain of K12 cliques, each with one internal edge (a_i, b_i)
    // removed and b_i bridged to a_{i+1}: the chain unravels ~3 rounds
    // per clique from BOTH ends simultaneously (a_1 and the last b_m
    // both start at deg 10), so 6 cliques need 9 rounds — past
    // KCoreT=8, and the operator must REFUSE (a silent partial core
    // would grade as if it were the k-core).
    val cliques = for {
      i <- 1L to 6L
      x <- 0L until 12L; y <- (x + 1) until 12L
      if !(x == 0L && y == 1L) // the removed (a_i, b_i) edge
    } yield (i * 100 + x, i * 100 + y)
    val bridges = (1L to 5L).map(i => (i * 100 + 1, (i + 1) * 100))
    val edges = (cliques ++ bridges).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      GraphRank.kcoreOverEdges(edges).collect()
    }
    assert(e.getMessage.contains("fixpoint"), e.getMessage)
  }

  // -------------------------------------------------------- graph_lpa

  test("lpa: planted cliques collapse to their min-id labels") {
    val c1 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val c2 = for (i <- 10L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val got = GraphRank.lpaOverEdges((c1 ++ c2).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    for (i <- 1L to 5L) assert(got(i) == 1L, s"node $i -> ${got(i)}")
    for (i <- 10L to 14L) assert(got(i) == 10L, s"node $i -> ${got(i)}")
  }

  test("lpa: smallest label wins a tie; frequency beats smallness") {
    // one round, all labels distinct: node 0's neighbors {5, 9} tie at
    // count 1 -> adopt the SMALLER label 5
    val tie = GraphRank.lpaOverEdges(
      Seq((0L, 5L), (0L, 9L)).toDF("src", "dst"), rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(tie(0L) == 5L, s"tie broke to ${tie(0L)}")
    // two rounds: after r1, node 20's neighbors carry labels
    // {7, 7, 3} (21 and 22 each adopted 7, 23 adopted 3) -> the
    // MORE FREQUENT 7 must beat the smaller 3
    val edges = Seq((20L, 21L), (20L, 22L), (20L, 23L),
      (21L, 7L), (22L, 7L), (23L, 3L)).toDF("src", "dst")
    val got = GraphRank.lpaOverEdges(edges, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(got(20L) == 7L, s"node 20 adopted ${got(20L)}, expected the majority label 7")
  }

  // ----------------------------------------------- graph_link_predict

  test("link predict: the missing clique edge ranks first with full Jaccard") {
    // K5 minus the (2,4) edge: 2 and 4 share neighbors {1,3,5} and
    // are non-adjacent -> cn=3, jac = 3e6/(3+3-3) = 1e6, rank 1
    val edges = (for (i <- 1L to 5L; j <- (i + 1) to 5L
                      if !(i == 2 && j == 4)) yield (i, j)).toDF("src", "dst")
    val got = GraphRank.linkPredictOverEdges(edges)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.head == ((2L, 4L, 3L, 1000000L)), s"got ${got.head}")
    // adjacent pairs never appear
    val undirected = Set((1L,2L),(1L,3L),(1L,4L),(1L,5L),(2L,3L),(2L,5L),(3L,4L),(3L,5L),(4L,5L))
    assert(got.forall { case (u, v, _, _) => !undirected((u, v)) })
  }

  // ------------------------------------------------- cluster_topics

  test("cluster topics: planted skew pins labels and exact lifts") {
    // two clusters, each with a dominant term plus a uniform term:
    // the dominant term lifts to exactly 2e6 ppm (double its corpus
    // share), the uniform term sits at exactly 1e6 (no lift), and
    // sub-support terms (tf 3 < 5) never appear
    val nd = (Seq.fill(3)((0, "alpha alpha beta common common")) ++
      Seq.fill(3)((1, "gamma gamma delta common common")))
      .toDF("centroid", "text")
    val got = Curation.clusterTopicsOn(nd)
      .as[(Int, Long, String, Long, Long, Long)].collect().toList
    assert(got == List(
      (0, 1L, "alpha", 6L, 15L, 2000000L),
      (0, 2L, "common", 6L, 15L, 1000000L),
      (1, 1L, "gamma", 6L, 15L, 2000000L),
      (1, 2L, "common", 6L, 15L, 1000000L)), s"got $got")
  }

  // ------------------------------------------------------ text_rake

  test("rake: hand-computed phrase scores on a planted corpus") {
    // "alpha beta" twice + "gamma" once, split by the stopword 'the':
    // freq(alpha)=freq(beta)=2, deg=4 each -> wscore 2e6;
    // gamma freq 1 deg 1 -> 1e6. Phrase scores: 4e6 and 1e6.
    val docs = Seq((1L, "alpha beta the alpha beta the gamma"))
      .toDF("doc_id", "text")
    val got = TextOps.rakeOn(docs)
      .as[(Long, String, Long, Long, Long)].collect().toList
    assert(got == List(
      (1L, "alpha beta", 2L, 2L, 4000000L),
      (2L, "gamma", 1L, 1L, 1000000L)), s"got $got")
  }

  test("rake: stopwords never enter phrases; multi-doc degs combine") {
    // the same phrase split across docs: instances count corpus-wide
    val docs = Seq((1L, "alpha beta"), (2L, "the alpha beta of x"))
      .toDF("doc_id", "text")
    val got = TextOps.rakeOn(docs)
      .as[(Long, String, Long, Long, Long)].collect().toList
    // freq(alpha)=2 deg=4, beta same; x freq 1 deg 1
    assert(got == List(
      (1L, "alpha beta", 2L, 2L, 4000000L),
      (2L, "x", 1L, 1L, 1000000L)), s"got $got")
    assert(got.forall(r => !TextOps.RakeStops.exists(r._2.split(" ").contains)))
  }

  // ---------------------------------------------------- stream_funnel

  test("stream funnel: tie excluded, pre-signup purchase excluded, 2-long state") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long)]
    val q = graft.streaming.StreamingQueries.funnelServe(input.toDS())
      .writeStream.format("memory").queryName("funnel_r13")
      .outputMode("append").start()
    // trigger 1: u2's purchase BEFORE its signup (same trigger, must
    // not qualify), u1 signup + a tie-ts purchase (strict >, excluded)
    input.addData((2L, "purchase", 50L), (2L, "signup", 60L),
      (1L, "signup", 100L), (1L, "purchase", 100L))
    q.processAllAvailable()
    // trigger 2: u1's qualifying purchase arrives later; u3 purchase-only
    input.addData((1L, "purchase", 150L), (3L, "purchase", 10L))
    q.processAllAvailable()
    input.addData((1L, "_flush", Long.MaxValue), (2L, "_flush", Long.MaxValue),
      (3L, "_flush", Long.MaxValue))
    q.processAllAvailable()
    val got = spark.table("funnel_r13")
      .as[(Long, Long, Option[Long], Int)].collect().toSet
    q.stop()
    assert(got == Set(
      (1L, 100L, Some(150L), 1),   // tie at 100 excluded, 150 converts
      (2L, 60L, None, 0)),         // pre-signup purchase never qualifies
      s"got $got")                 // u3 (no signup) emits nothing
  }

  // ------------------------------------------------ stream_embed_dedup

  test("stream embed dedup == batch semdedup row-for-row") {
    val stream = graft.streaming.StreamingQueries
      .queries("stream_embed_dedup")(spark, sfDir)
      .as[(Long, Int, Boolean, Option[Long])].collect().toSet
    val batch = graft.operators.Dedup.queries("semdedup")(spark, sfDir)
      .as[(Long, Int, Boolean, Option[Long])].collect().toSet
    assert(stream == batch, "ingest-gate flagging diverged from batch semdedup")
    assert(stream.exists(!_._3), "vacuous: no duplicate flagged at this SF")
  }

  // -------------------------------------------------- graph_bfs_levels

  test("bfs levels: planted path pins hop counts and the T-round horizon") {
    // path 0-20-21-22-23-24 from seed 0 (seedsBelow=1), star leaf 30:
    // hops 1..4 inside the horizon, node 24 at hop 5 stays NULL
    val edges = Seq((0L, 20L), (20L, 21L), (21L, 22L), (22L, 23L),
      (23L, 24L), (0L, 30L)).toDF("src", "dst")
    val got = GraphRank.bfsOverEdges(edges, seedsBelow = 1L)
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(0L -> Some(0L), 20L -> Some(1L), 21L -> Some(2L),
      22L -> Some(3L), 23L -> Some(4L), 24L -> None, 30L -> Some(1L)),
      s"got $got")
  }

  // ------------------------------------------------------ events_ntile

  test("ntile deciles: counts conserve, buckets balanced, bounds ordered") {
    val rows = Relational.eventsNtile(spark, sfDir)
      .as[(String, Int, Long, Long, Long)].collect()
    val byType = rows.groupBy(_._1)
    val totals = Tables.load(spark, sfDir, "events")
      .groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    for ((t, rs) <- byType) {
      assert(rs.map(_._3).sum == totals(t), s"$t: counts lost")
      assert(rs.map(_._2).sorted.toList == (1 to 10).toList, s"$t: deciles missing")
      // balanced: sizes differ by at most one
      assert(rs.map(_._3).max - rs.map(_._3).min <= 1, s"$t: unbalanced")
      // boundaries non-decreasing across deciles
      val ordered = rs.sortBy(_._2)
      ordered.sliding(2).foreach { case Array(a, b) =>
        assert(a._5 <= b._4, s"$t: decile ${a._2} max > decile ${b._2} min")
      case _ => }
    }
  }

  // -------------------------------------------------- events_drift

  test("drift: identical halves measure 0, disjoint halves 1e6") {
    // window split is the ts-range midpoint; value distribution equal
    // in both halves -> TV = 0 exactly
    val same = (0L until 100L).map(i =>
      ("click", i * 1000L, (i % 10) * 600L)).toDF("event_type", "ts", "vc")
    val tv0 = Relational.driftCore(same)
      .select("tv_ppm").as[Long].collect()
    assert(tv0.toList == List(0L), s"identical halves drifted: ${tv0.toList}")
    // first half all in bucket 0, second half all in bucket 10 -> TV = 1
    val flip = (0L until 100L).map(i =>
      ("click", i * 1000L, if (i < 50) 0L else 5000L)).toDF("event_type", "ts", "vc")
    val tv1 = Relational.driftCore(flip)
      .select("tv_ppm").as[Long].collect()
    assert(tv1.toList == List(1000000L), s"disjoint halves: ${tv1.toList}")
  }

  // -------------------------------------------- events_type_trigrams

  test("trigrams: planted journey counts exactly, sequences never cross users") {
    val e = Seq(
      // user 1: v v c p  -> trigrams (v,v,c), (v,c,p)
      (1L, 10L, 1L, "v"), (1L, 20L, 2L, "v"), (1L, 30L, 3L, "c"), (1L, 40L, 4L, "p"),
      // user 2: v v c    -> (v,v,c); its tail never chains into user 3
      (2L, 10L, 5L, "v"), (2L, 20L, 6L, "v"), (2L, 30L, 7L, "c"),
      (3L, 5L, 8L, "p"), (3L, 6L, 9L, "p")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Relational.trigramsCore(e)
      .as[(String, String, String, Long)].collect().toSet
    assert(got == Set(("v", "v", "c", 2L), ("v", "c", "p", 1L)), s"got $got")
  }

  // ---------------------------------------------------- q_basket_pairs

  test("basket pairs: support bounded by both marginals, ratios exact") {
    val rows = Relational.qBasketPairs(spark, sfDir)
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, sup, ca, cb, cab, cba, _) =>
      assert(a < b, "pair not canonically ordered")
      assert(sup <= ca && sup <= cb, s"($a,$b): support exceeds a marginal")
      assert(cab == sup * 1000000L / ca && cba == sup * 1000000L / cb,
        s"($a,$b): confidence not the exact rational")
    }
  }

  // ------------------------------------------------ dedup_lsh_tradeoff

  test("lsh tradeoff: candidates nest across band shapes; exact dups always caught") {
    // bands align (8k..8k+7 = two 4-lane bands = four 2-lane bands), so
    // an (4x8) collision implies an (8x4) collision implies (16x2):
    // candidate sets nest and recall is monotone in band count
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
      (3L, "one two three four five six seven eight"),
      (4L, "one two three four five nine ten eleven"),       // near dup of 3
      (5L, "totally different words appear in this document here")
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.lshTradeoffOn(docs)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val (permissive, mid, strict) = (got("16x2"), got("8x4"), got("4x8"))
    assert(permissive._2 >= mid._2 && mid._2 >= strict._2, "candidates not nested")
    assert(permissive._4 >= mid._4 && mid._4 >= strict._4, "hits not nested")
    // the exact duplicate pair (identical signature) collides in EVERY
    // band of every config — all three must count it as a hit
    assert(strict._4 >= 1L, "exact dup escaped the strictest banding")
    assert(got.values.forall(r => r._3 == permissive._3), "truth differs per config")
  }

  // ---------------------------------------------------- events_markov

  test("markov: planted transitions exact, rows normalize to <= 1e6") {
    val e = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "a"),
      (1L, 40L, 4L, "c"),
      (2L, 10L, 5L, "a"), (2L, 20L, 6L, "b")
    ).toDF("user_id", "ts", "event_id", "event_type")
    // transitions: u1 a->b, b->a, a->c; u2 a->b  => a: {b:2, c:1}, b: {a:1}
    val got = Relational.markovCore(e)
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("a", "b", 2L, 3L, 666666L),
      ("a", "c", 1L, 3L, 333333L),
      ("b", "a", 1L, 1L, 1000000L)), s"got $got")
    // per-row ppm sums land within floor loss of exactly 1e6
    got.groupBy(_._1).foreach { case (t1, rs) =>
      val s = rs.toSeq.map(_._5).sum
      assert(s <= 1000000L && s > 1000000L - rs.size, s"$t1 row sums to $s")
    }
  }

  // --------------------------------------------------- ivf_cell_stats

  test("cell stats: counts conserve, shares normalize, hot flag consistent") {
    val rows = graft.operators.IvfIndex.queries("ivf_cell_stats")(spark, sfDir)
      .as[(Int, Long, Long, Boolean)].collect()
    val n = Tables.load(spark, sfDir, "embeddings").count()
    assert(rows.map(_._2).sum == n, "cells lost vectors")
    val shares = rows.map(_._3).sum
    assert(shares <= 1000000L && shares > 1000000L - rows.length)
    rows.foreach { case (c, nv, _, hot) =>
      assert(hot == (nv * 16L > 2L * n), s"cell $c hot flag wrong")
    }
  }

  // ------------------------------------------------- q8_market_share

  test("q8: share is exactly num/denom of the same exact cents") {
    val rows = Relational.q8MarketShare(spark, sfDir)
      .as[(Int, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (y, num, denom, share) =>
      assert(num >= 0L && num <= denom, s"$y: numerator out of range")
      assert(share == num.toDouble / denom.toDouble, s"$y: share not the exact quotient")
    }
  }
}
